"""Shared utilities: logging/messages, problem generators."""
