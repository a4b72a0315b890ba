"""Sources & sinks: docs/seed readers and the checkpointed state store."""
