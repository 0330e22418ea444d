"""Neural models: stacked hourglass CNN, pose VAE prior, pose denoiser."""
