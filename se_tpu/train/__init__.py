"""Training: masked losses, train step, checkpointing."""
