import generation_pb2 as _generation_pb2
from google.protobuf.internal import containers as _containers
from google.protobuf.internal import enum_type_wrapper as _enum_type_wrapper
from google.protobuf import descriptor as _descriptor
from google.protobuf import message as _message
from typing import ClassVar as _ClassVar, Iterable as _Iterable, Mapping as _Mapping, Optional as _Optional, Union as _Union

AUDIO: EngineType
CLASSIFICATION: EngineType
DESCRIPTOR: _descriptor.FileDescriptor
GENERATE: EngineTaskGroup
GPT2: EngineTokenizer
HINTER: EngineTaskGroup
PICTURE: EngineType
PILE: EngineTokenizer
STORAGE: EngineType
TEXT: EngineType
UPSCALE: EngineTaskGroup
UTILITY: EngineTaskGroup
VIDEO: EngineType

class EngineHintImageType(_message.Message):
    __slots__ = ["provider", "type"]
    PROVIDER_FIELD_NUMBER: _ClassVar[int]
    TYPE_FIELD_NUMBER: _ClassVar[int]
    provider: _containers.RepeatedScalarFieldContainer[str]
    type: str
    def __init__(self, type: _Optional[str] = ..., provider: _Optional[_Iterable[str]] = ...) -> None: ...

class EngineInfo(_message.Message):
    __slots__ = ["accepted_hint_types", "accepted_prompt_artifacts", "description", "id", "name", "owner", "ready", "supported_samplers", "task", "tokenizer", "type"]
    ACCEPTED_HINT_TYPES_FIELD_NUMBER: _ClassVar[int]
    ACCEPTED_PROMPT_ARTIFACTS_FIELD_NUMBER: _ClassVar[int]
    DESCRIPTION_FIELD_NUMBER: _ClassVar[int]
    ID_FIELD_NUMBER: _ClassVar[int]
    NAME_FIELD_NUMBER: _ClassVar[int]
    OWNER_FIELD_NUMBER: _ClassVar[int]
    READY_FIELD_NUMBER: _ClassVar[int]
    SUPPORTED_SAMPLERS_FIELD_NUMBER: _ClassVar[int]
    TASK_FIELD_NUMBER: _ClassVar[int]
    TOKENIZER_FIELD_NUMBER: _ClassVar[int]
    TYPE_FIELD_NUMBER: _ClassVar[int]
    accepted_hint_types: _containers.RepeatedCompositeFieldContainer[EngineHintImageType]
    accepted_prompt_artifacts: _containers.RepeatedScalarFieldContainer[_generation_pb2.ArtifactType]
    description: str
    id: str
    name: str
    owner: str
    ready: bool
    supported_samplers: _containers.RepeatedCompositeFieldContainer[EngineSampler]
    task: str
    tokenizer: EngineTokenizer
    type: EngineType
    def __init__(self, id: _Optional[str] = ..., owner: _Optional[str] = ..., ready: bool = ..., type: _Optional[_Union[EngineType, str]] = ..., tokenizer: _Optional[_Union[EngineTokenizer, str]] = ..., name: _Optional[str] = ..., description: _Optional[str] = ..., supported_samplers: _Optional[_Iterable[_Union[EngineSampler, _Mapping]]] = ..., accepted_prompt_artifacts: _Optional[_Iterable[_Union[_generation_pb2.ArtifactType, str]]] = ..., accepted_hint_types: _Optional[_Iterable[_Union[EngineHintImageType, _Mapping]]] = ..., task: _Optional[str] = ...) -> None: ...

class EngineSampler(_message.Message):
    __slots__ = ["sampler", "supported_noise_types", "supports_churn", "supports_eta", "supports_karras_rho", "supports_sigma_limits"]
    SAMPLER_FIELD_NUMBER: _ClassVar[int]
    SUPPORTED_NOISE_TYPES_FIELD_NUMBER: _ClassVar[int]
    SUPPORTS_CHURN_FIELD_NUMBER: _ClassVar[int]
    SUPPORTS_ETA_FIELD_NUMBER: _ClassVar[int]
    SUPPORTS_KARRAS_RHO_FIELD_NUMBER: _ClassVar[int]
    SUPPORTS_SIGMA_LIMITS_FIELD_NUMBER: _ClassVar[int]
    sampler: _generation_pb2.DiffusionSampler
    supported_noise_types: _containers.RepeatedScalarFieldContainer[_generation_pb2.SamplerNoiseType]
    supports_churn: bool
    supports_eta: bool
    supports_karras_rho: bool
    supports_sigma_limits: bool
    def __init__(self, sampler: _Optional[_Union[_generation_pb2.DiffusionSampler, str]] = ..., supports_eta: bool = ..., supports_churn: bool = ..., supports_sigma_limits: bool = ..., supports_karras_rho: bool = ..., supported_noise_types: _Optional[_Iterable[_Union[_generation_pb2.SamplerNoiseType, str]]] = ...) -> None: ...

class Engines(_message.Message):
    __slots__ = ["engine"]
    ENGINE_FIELD_NUMBER: _ClassVar[int]
    engine: _containers.RepeatedCompositeFieldContainer[EngineInfo]
    def __init__(self, engine: _Optional[_Iterable[_Union[EngineInfo, _Mapping]]] = ...) -> None: ...

class ListEnginesRequest(_message.Message):
    __slots__ = ["task_group"]
    TASK_GROUP_FIELD_NUMBER: _ClassVar[int]
    task_group: EngineTaskGroup
    def __init__(self, task_group: _Optional[_Union[EngineTaskGroup, str]] = ...) -> None: ...

class EngineType(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class EngineTokenizer(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class EngineTaskGroup(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []
