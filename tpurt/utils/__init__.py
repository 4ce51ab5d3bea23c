"""Aux subsystems: config, logging, profiling, checkpointing (SURVEY.md §5)."""
