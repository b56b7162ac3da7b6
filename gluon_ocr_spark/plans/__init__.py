"""Job plans: checkpointed, resumable extraction runs with lineage."""
