"""Shared error types (kept import-cycle-free: operators and plans both use
PipelineError; plans/blocks re-exports it for backwards compatibility)."""

from __future__ import annotations


class PipelineError(ValueError):
    """Invalid block pipeline — mirrors the reference's anyhow! errors
    (e.g. stash pop/subtract on a missing key, main.rs:2320-2333)."""
