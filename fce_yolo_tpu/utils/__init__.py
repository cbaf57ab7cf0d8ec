"""Utilities: metrics, callbacks, logging, profiling."""
