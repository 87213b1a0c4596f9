"""Shared utilities: torch weight conversion, config, profiling."""
