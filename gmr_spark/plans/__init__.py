from gmr_spark.plans.pregel import PregelProgram, PregelResult, run_pregel

__all__ = ["PregelProgram", "PregelResult", "run_pregel"]
