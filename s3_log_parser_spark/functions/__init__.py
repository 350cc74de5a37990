"""Scalar kernels: hashing, grok parsing, encodings, text analysis, vectors."""
