"""Structured-streaming variant of the pipeline."""
