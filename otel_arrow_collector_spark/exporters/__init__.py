"""Egress operators: the exporterhelper sender chain
(obsreport -> queue -> retry -> timeout -> push,
exporter/exporterhelper/common.go:157-177) re-expressed for Spark sinks."""

from .obsreport import ObsReport
from .retry import (PartialSuccess, PermanentError, RetryConfig, RetrySender,
                    ThrottleError, TransientError, foreach_batch_sink)

__all__ = ["ObsReport", "PartialSuccess", "PermanentError", "RetryConfig",
           "RetrySender", "ThrottleError", "TransientError",
           "foreach_batch_sink"]
