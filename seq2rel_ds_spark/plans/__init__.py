"""Pipeline plans: staged, checkpointed, resumable jobs with lineage."""
