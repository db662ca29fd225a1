from query_engine_spark.plans.blocks import PipelineContext, translate_pipeline, PipelineError

__all__ = ["PipelineContext", "translate_pipeline", "PipelineError"]
