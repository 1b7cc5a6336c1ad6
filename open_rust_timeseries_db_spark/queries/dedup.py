"""Placeholder — populated in this round's later milestones."""
