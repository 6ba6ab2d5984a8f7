"""Model components (flax.linen, channel-last [B, T, C])."""
