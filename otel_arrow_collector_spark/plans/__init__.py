"""Pipeline planning: YAML/dict pipeline spec -> validated DAG -> compiled
Spark plan (service/internal/graph/graph.go semantics, Spark-first)."""

from .pipeline import (CompiledPlan, ConfigError, CycleError, DataRefusedError,
                       PipelineGraph)

__all__ = ["CompiledPlan", "ConfigError", "CycleError", "DataRefusedError",
           "PipelineGraph"]
