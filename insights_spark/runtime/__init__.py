"""Runtime: checkpoint/resume, per-partition lineage metrics, skew salting."""
