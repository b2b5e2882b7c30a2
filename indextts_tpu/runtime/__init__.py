"""Jitted inference programs, orchestration engine, serving, checkpoints."""
