"""CLI entry points (the reference's main/ scripts)."""
