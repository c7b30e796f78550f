"""Job plans: the end-to-end extraction pipeline (checkpointed,
resumable, lineage-tracked) per the north rule."""
