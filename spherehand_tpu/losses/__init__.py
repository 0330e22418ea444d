"""Self-supervision loss stack: geometric priors, multi-view terms, multitask
assembly."""
