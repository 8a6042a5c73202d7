"""Exception -> gRPC status mapping decorator (reference
gyre/services/exception_to_grpc.py:16-92 semantics)."""

from __future__ import annotations

import inspect
import logging
import traceback
from functools import wraps

import grpc

logger = logging.getLogger(__name__)


class CacheKeyError(KeyError):
    """Raised when a request references a cache id we no longer hold."""


from ..manager.scheduler import DeviceWedgedError

DEFAULT_MAP = {
    DeviceWedgedError: grpc.StatusCode.UNAVAILABLE,
    PermissionError: grpc.StatusCode.PERMISSION_DENIED,  # ResourceError
    NotImplementedError: grpc.StatusCode.UNIMPLEMENTED,
    KeyError: grpc.StatusCode.NOT_FOUND,
    CacheKeyError: lambda e: (grpc.StatusCode.FAILED_PRECONDITION,
                              f"cache miss: {e.args[0]}"),
    ValueError: grpc.StatusCode.INVALID_ARGUMENT,
    TypeError: grpc.StatusCode.INVALID_ARGUMENT,
}


def exception_to_grpc(mapping: dict | None = None, dev: bool = False):
    """Decorator for unary and generator grpc handlers."""
    exmap = {**DEFAULT_MAP, **(mapping or {})}

    def resolve(e):
        for cls in type(e).__mro__:
            if cls in exmap:
                entry = exmap[cls]
                if callable(entry) and not isinstance(entry, grpc.StatusCode):
                    return entry(e)
                return entry, str(e)
        return grpc.StatusCode.INTERNAL, str(e)

    def handle(e, context):
        code, detail = resolve(e)
        logger.error("rpc error %s: %s", code, detail)
        if dev:
            detail += "\n" + traceback.format_exc()
        context.abort(code, detail)

    def decorator(fn):
        if inspect.isgeneratorfunction(fn):

            @wraps(fn)
            def gen(self, request, context):
                try:
                    yield from fn(self, request, context)
                except grpc.RpcError:
                    raise
                except Exception as e:  # noqa: BLE001
                    handle(e, context)

            return gen

        @wraps(fn)
        def unary(self, request, context):
            try:
                return fn(self, request, context)
            except grpc.RpcError:
                raise
            except Exception as e:  # noqa: BLE001
                handle(e, context)

        return unary

    return decorator
