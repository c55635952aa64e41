"""Multimodal binary-column plumbing (decode stubs, Arrow batch stages)."""

from .binary_ops import attach_binary_payload, extract_binary_meta  # noqa: F401
