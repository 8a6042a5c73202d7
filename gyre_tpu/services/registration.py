"""Hand-written gRPC service registration.

The environment has no grpc_python_plugin, so instead of generated
*_pb2_grpc.py modules the method handlers are declared explicitly — the
method set and full names match the reference protocol exactly
(gooseai.GenerationService / gooseai.EnginesService /
gooseai.DashboardService)."""

from __future__ import annotations

import grpc

from ..generated import dashboard_pb2 as dpb
from ..generated import engines_pb2 as epb
from ..generated import generation_pb2 as gpb

GENERATION_SERVICE = "gooseai.GenerationService"
ENGINES_SERVICE = "gooseai.EnginesService"
DASHBOARD_SERVICE = "gooseai.DashboardService"


def generation_handlers(servicer) -> grpc.GenericRpcHandler:
    handlers = {
        "Generate": grpc.unary_stream_rpc_method_handler(
            servicer.Generate,
            request_deserializer=gpb.Request.FromString,
            response_serializer=gpb.Answer.SerializeToString),
        "ChainGenerate": grpc.unary_stream_rpc_method_handler(
            servicer.ChainGenerate,
            request_deserializer=gpb.ChainRequest.FromString,
            response_serializer=gpb.Answer.SerializeToString),
        "AsyncGenerate": grpc.unary_unary_rpc_method_handler(
            servicer.AsyncGenerate,
            request_deserializer=gpb.Request.FromString,
            response_serializer=gpb.AsyncHandle.SerializeToString),
        "AsyncResult": grpc.unary_unary_rpc_method_handler(
            servicer.AsyncResult,
            request_deserializer=gpb.AsyncHandle.FromString,
            response_serializer=gpb.AsyncAnswer.SerializeToString),
        "AsyncCancel": grpc.unary_unary_rpc_method_handler(
            servicer.AsyncCancel,
            request_deserializer=gpb.AsyncHandle.FromString,
            response_serializer=gpb.AsyncCancelAnswer.SerializeToString),
    }
    return grpc.method_handlers_generic_handler(GENERATION_SERVICE, handlers)


def engines_handlers(servicer) -> grpc.GenericRpcHandler:
    handlers = {
        "ListEngines": grpc.unary_unary_rpc_method_handler(
            servicer.ListEngines,
            request_deserializer=epb.ListEnginesRequest.FromString,
            response_serializer=epb.Engines.SerializeToString),
    }
    return grpc.method_handlers_generic_handler(ENGINES_SERVICE, handlers)


def dashboard_handlers(servicer) -> grpc.GenericRpcHandler:
    handlers = {
        "GetMe": grpc.unary_unary_rpc_method_handler(
            servicer.GetMe,
            request_deserializer=dpb.EmptyRequest.FromString,
            response_serializer=dpb.User.SerializeToString),
    }
    return grpc.method_handlers_generic_handler(DASHBOARD_SERVICE, handlers)


def add_all(server: grpc.Server, generation=None, engines=None,
            dashboard=None):
    handlers = []
    if generation is not None:
        handlers.append(generation_handlers(generation))
    if engines is not None:
        handlers.append(engines_handlers(engines))
    if dashboard is not None:
        handlers.append(dashboard_handlers(dashboard))
    server.add_generic_rpc_handlers(tuple(handlers))
