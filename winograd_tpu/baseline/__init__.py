"""XLA baseline path — the role cuDNN plays in the reference."""
