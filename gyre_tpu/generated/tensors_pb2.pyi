from google.protobuf.internal import containers as _containers
from google.protobuf.internal import enum_type_wrapper as _enum_type_wrapper
from google.protobuf import descriptor as _descriptor
from google.protobuf import message as _message
from typing import ClassVar as _ClassVar, Iterable as _Iterable, Mapping as _Mapping, Optional as _Optional, Union as _Union

AT_BUFFER: AttributeType
AT_PARAMETER: AttributeType
DESCRIPTOR: _descriptor.FileDescriptor
DT_BFLOAT16: Dtype
DT_BOOL: Dtype
DT_COMPLEX128: Dtype
DT_COMPLEX32: Dtype
DT_COMPLEX64: Dtype
DT_FLOAT16: Dtype
DT_FLOAT32: Dtype
DT_FLOAT64: Dtype
DT_INT16: Dtype
DT_INT32: Dtype
DT_INT64: Dtype
DT_INT8: Dtype
DT_INVALID: Dtype
DT_QINT32: Dtype
DT_QINT8: Dtype
DT_QUINT4_2: Dtype
DT_QUINT8: Dtype
DT_UINT8: Dtype

class Attribute(_message.Message):
    __slots__ = ["bool", "float", "int64", "module", "name", "string", "tensor"]
    BOOL_FIELD_NUMBER: _ClassVar[int]
    FLOAT_FIELD_NUMBER: _ClassVar[int]
    INT64_FIELD_NUMBER: _ClassVar[int]
    MODULE_FIELD_NUMBER: _ClassVar[int]
    NAME_FIELD_NUMBER: _ClassVar[int]
    STRING_FIELD_NUMBER: _ClassVar[int]
    TENSOR_FIELD_NUMBER: _ClassVar[int]
    bool: bool
    float: float
    int64: int
    module: Module
    name: str
    string: str
    tensor: Tensor
    def __init__(self, name: _Optional[str] = ..., module: _Optional[_Union[Module, _Mapping]] = ..., tensor: _Optional[_Union[Tensor, _Mapping]] = ..., string: _Optional[str] = ..., int64: _Optional[int] = ..., float: _Optional[float] = ..., bool: bool = ...) -> None: ...

class Module(_message.Message):
    __slots__ = ["attributes", "name", "names"]
    ATTRIBUTES_FIELD_NUMBER: _ClassVar[int]
    NAMES_FIELD_NUMBER: _ClassVar[int]
    NAME_FIELD_NUMBER: _ClassVar[int]
    attributes: _containers.RepeatedCompositeFieldContainer[Attribute]
    name: str
    names: _containers.RepeatedScalarFieldContainer[str]
    def __init__(self, name: _Optional[str] = ..., names: _Optional[_Iterable[str]] = ..., attributes: _Optional[_Iterable[_Union[Attribute, _Mapping]]] = ...) -> None: ...

class Tensor(_message.Message):
    __slots__ = ["attr_type", "data", "dtype", "shape"]
    ATTR_TYPE_FIELD_NUMBER: _ClassVar[int]
    DATA_FIELD_NUMBER: _ClassVar[int]
    DTYPE_FIELD_NUMBER: _ClassVar[int]
    SHAPE_FIELD_NUMBER: _ClassVar[int]
    attr_type: AttributeType
    data: bytes
    dtype: Dtype
    shape: _containers.RepeatedScalarFieldContainer[int]
    def __init__(self, dtype: _Optional[_Union[Dtype, str]] = ..., shape: _Optional[_Iterable[int]] = ..., data: _Optional[bytes] = ..., attr_type: _Optional[_Union[AttributeType, str]] = ...) -> None: ...

class Dtype(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class AttributeType(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []
