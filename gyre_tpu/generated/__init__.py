"""Regenerated protocol stubs, wire-compatible with the reference server's
generation/engines/tensors/dashboard protos (see scripts/dump_protos.py).

protoc emits flat `import tensors_pb2` statements, so this package directory
is added to sys.path before loading the stubs.
"""

import os
import sys

_here = os.path.dirname(__file__)
if _here not in sys.path:
    sys.path.insert(0, _here)

import dashboard_pb2  # noqa: E402
import engines_pb2  # noqa: E402
import generation_pb2  # noqa: E402
import tensors_pb2  # noqa: E402

__all__ = ["generation_pb2", "engines_pb2", "tensors_pb2", "dashboard_pb2"]
