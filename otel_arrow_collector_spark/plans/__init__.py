"""Pipeline planning: YAML/dict pipeline spec -> validated DAG -> compiled
Spark plan (service/internal/graph/graph.go semantics, Spark-first)."""

from .featuregate import Gate, GateError, Registry, Stage, global_registry
from .pipeline import (CompiledPlan, ConfigError, CycleError, DataRefusedError,
                       PipelineGraph)

__all__ = ["CompiledPlan", "ConfigError", "CycleError", "DataRefusedError",
           "Gate", "GateError", "PipelineGraph", "Registry", "Stage",
           "global_registry"]
