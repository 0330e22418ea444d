"""Training engine: jitted train/eval steps, optimizer, checkpointing, CLI."""
