"""GAN / VAE losses.

Behavioral parity target: wetts/vits/losses.py:6-60 — LS-GAN discriminator and
generator losses, x2-scaled feature matching, and the VITS KL between the
flow-mapped posterior and the aligned prior. All computed in float32.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def feature_loss(fmap_r: Sequence[Sequence[Array]],
                 fmap_g: Sequence[Sequence[Array]]) -> Array:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl.astype(jnp.float32))
            loss += jnp.mean(jnp.abs(rl - gl.astype(jnp.float32)))
    return loss * 2


def discriminator_loss(disc_real: Sequence[Array],
                       disc_gen: Sequence[Array]
                       ) -> Tuple[Array, List[Array], List[Array]]:
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        r_loss = jnp.mean((1.0 - dr.astype(jnp.float32)) ** 2)
        g_loss = jnp.mean(dg.astype(jnp.float32) ** 2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs: Sequence[Array]
                   ) -> Tuple[Array, List[Array]]:
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def kl_loss(z_p: Array, logs_q: Array, m_p: Array, logs_p: Array,
            z_mask: Array) -> Array:
    """All inputs [B, T, C] (channel-last); z_mask [B, T, 1]."""
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    # mask has a singleton channel, so sum(z_mask) counts valid frames only —
    # identical to the reference's [b, 1, t] mask normalization (losses.py:58-59)
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)
