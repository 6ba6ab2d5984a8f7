"""Training: losses, optimizer/state bundles, data-parallel GAN step."""
