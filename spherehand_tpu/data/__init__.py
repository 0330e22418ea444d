"""Data pipelines: on-device synthetic pose sampling, depth augmentation, and
the NYU multi-view real-data pipeline."""
