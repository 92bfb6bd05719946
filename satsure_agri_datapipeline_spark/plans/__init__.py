from satsure_agri_datapipeline_spark.plans.pipeline import PipelineResult, run_pipeline

__all__ = ["PipelineResult", "run_pipeline"]
