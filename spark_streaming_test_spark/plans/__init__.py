"""Physical-plan introspection — the engine's scale self-checks."""
