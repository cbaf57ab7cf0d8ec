"""Training layer: task-aligned assignment, losses, optimizer, trainer."""
