"""Binary gRPC frontend (reference: tensorrt_llm/grpc/)."""
from . import tllm_service_pb2
from .grpc_server import GrpcClient, GrpcServer, sampling_params_from_proto

__all__ = ["GrpcServer", "GrpcClient", "sampling_params_from_proto",
           "tllm_service_pb2"]
