from mrmr_spark.plans.checkpoint import PhaseRunner, checkpoint_phase, resume_or_run  # noqa: F401
