"""Scalar/column function registry: OTTL-style attribute and record ops
(docs/processing.md:96-214 of the reference), expressed as Column
transformations so they stay inside Catalyst/codegen."""

from .ottl import (apply_ottl, keep_keys, map_delete, map_put, replace_match,
                   trace_state_delete, trace_state_get, trace_state_put,
                   truncate_all)

__all__ = ["apply_ottl", "keep_keys", "map_delete", "map_put",
           "replace_match", "trace_state_delete", "trace_state_get",
           "trace_state_put", "truncate_all"]
