"""Multimodal column plumbing (binary payloads + typed metadata)."""
