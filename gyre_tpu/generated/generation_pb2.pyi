import tensors_pb2 as _tensors_pb2
from google.protobuf.internal import containers as _containers
from google.protobuf.internal import enum_type_wrapper as _enum_type_wrapper
from google.protobuf import descriptor as _descriptor
from google.protobuf import message as _message
from typing import ClassVar as _ClassVar, Iterable as _Iterable, Mapping as _Mapping, Optional as _Optional, Union as _Union

ACTION_DISCARD: Action
ACTION_OBFUSCATE: Action
ACTION_OBFUSCATE_DUPLICATE: Action
ACTION_PASSTHROUGH: Action
ACTION_REGENERATE: Action
ACTION_REGENERATE_DUPLICATE: Action
ALPHA: BackgroundRemovalMode
ARTIFACT_AFTER_ADJUSTMENTS: ArtifactStage
ARTIFACT_AFTER_POSTADJUSTMENTS: ArtifactStage
ARTIFACT_BEFORE_ADJUSTMENTS: ArtifactStage
ARTIFACT_CLASSIFICATIONS: ArtifactType
ARTIFACT_DEPTH: ArtifactType
ARTIFACT_EMBEDDING: ArtifactType
ARTIFACT_HINT_IMAGE: ArtifactType
ARTIFACT_IMAGE: ArtifactType
ARTIFACT_LATENT: ArtifactType
ARTIFACT_LORA: ArtifactType
ARTIFACT_MASK: ArtifactType
ARTIFACT_NONE: ArtifactType
ARTIFACT_TENSOR: ArtifactType
ARTIFACT_TEXT: ArtifactType
ARTIFACT_TOKENS: ArtifactType
ARTIFACT_TOKEN_EMBEDDING: ArtifactType
ARTIFACT_VIDEO: ArtifactType
ASSET_DELETE: AssetAction
ASSET_GET: AssetAction
ASSET_PUT: AssetAction
ASSET_USE_INPUT: AssetUse
ASSET_USE_INTERMEDIATE: AssetUse
ASSET_USE_OUTPUT: AssetUse
ASSET_USE_PROJECT: AssetUse
ASSET_USE_UNDEFINED: AssetUse
BLUR: BackgroundRemovalMode
CHANNEL_A: ChannelSource
CHANNEL_B: ChannelSource
CHANNEL_DISCARD: ChannelSource
CHANNEL_G: ChannelSource
CHANNEL_ONE: ChannelSource
CHANNEL_R: ChannelSource
CHANNEL_ZERO: ChannelSource
CLSFR_MODE_MULTICLASS: ClassifierMode
CLSFR_MODE_ZEROSHOT: ClassifierMode
CROSS_ATTENTION: WeightMethod
DESCRIPTOR: _descriptor.FileDescriptor
DIRECTION_DOWN: GaussianDirection
DIRECTION_NONE: GaussianDirection
DIRECTION_UP: GaussianDirection
ERROR: FinishReason
FILTER: FinishReason
GUIDANCE_PRESET_FAST_BLUE: GuidancePreset
GUIDANCE_PRESET_FAST_GREEN: GuidancePreset
GUIDANCE_PRESET_NONE: GuidancePreset
GUIDANCE_PRESET_SIMPLE: GuidancePreset
GUIDANCE_PRESET_SLOW: GuidancePreset
GUIDANCE_PRESET_SLOWER: GuidancePreset
GUIDANCE_PRESET_SLOWEST: GuidancePreset
HINT_BALANCED: HintPriority
HINT_PRIORITISE_HINT: HintPriority
HINT_PRIORITISE_PROMPT: HintPriority
LENGTH: FinishReason
MASKED_AREA_INIT_ORIGINAL: MaskedAreaInit
MASKED_AREA_INIT_RANDOM: MaskedAreaInit
MASKED_AREA_INIT_ZERO: MaskedAreaInit
MODEL_ARCHITECTURE_CLIP_RESNET: ModelArchitecture
MODEL_ARCHITECTURE_CLIP_VIT: ModelArchitecture
MODEL_ARCHITECTURE_LDM: ModelArchitecture
MODEL_ARCHITECTURE_NONE: ModelArchitecture
NOTHING: BackgroundRemovalMode
NULL: FinishReason
RESCALE_CONTAIN_REFLECT: RescaleMode
RESCALE_CONTAIN_REPLICATE: RescaleMode
RESCALE_CONTAIN_ZERO: RescaleMode
RESCALE_COVER: RescaleMode
RESCALE_STRICT: RescaleMode
SAMPLER_DDIM: DiffusionSampler
SAMPLER_DDPM: DiffusionSampler
SAMPLER_DPMSOLVERPP_1ORDER: DiffusionSampler
SAMPLER_DPMSOLVERPP_2M: DiffusionSampler
SAMPLER_DPMSOLVERPP_2ORDER: DiffusionSampler
SAMPLER_DPMSOLVERPP_2S_ANCESTRAL: DiffusionSampler
SAMPLER_DPMSOLVERPP_3ORDER: DiffusionSampler
SAMPLER_DPMSOLVERPP_SDE: DiffusionSampler
SAMPLER_DPM_ADAPTIVE: DiffusionSampler
SAMPLER_DPM_FAST: DiffusionSampler
SAMPLER_K_DPMPP_2M: DiffusionSampler
SAMPLER_K_DPMPP_2S_ANCESTRAL: DiffusionSampler
SAMPLER_K_DPMPP_SDE: DiffusionSampler
SAMPLER_K_DPM_2: DiffusionSampler
SAMPLER_K_DPM_2_ANCESTRAL: DiffusionSampler
SAMPLER_K_EULER: DiffusionSampler
SAMPLER_K_EULER_ANCESTRAL: DiffusionSampler
SAMPLER_K_HEUN: DiffusionSampler
SAMPLER_K_LMS: DiffusionSampler
SAMPLER_NOISE_BROWNIAN: SamplerNoiseType
SAMPLER_NOISE_NORMAL: SamplerNoiseType
SOLID: BackgroundRemovalMode
STAGE_ACTION_DISCARD: StageAction
STAGE_ACTION_PASS: StageAction
STAGE_ACTION_RETURN: StageAction
STOP: FinishReason
TEXT_ENCODER: WeightMethod
UPSCALER_ESRGAN: Upscaler
UPSCALER_GFPGAN: Upscaler
UPSCALER_RGB: Upscaler

class Answer(_message.Message):
    __slots__ = ["answer_id", "artifacts", "created", "meta", "received", "request_id"]
    ANSWER_ID_FIELD_NUMBER: _ClassVar[int]
    ARTIFACTS_FIELD_NUMBER: _ClassVar[int]
    CREATED_FIELD_NUMBER: _ClassVar[int]
    META_FIELD_NUMBER: _ClassVar[int]
    RECEIVED_FIELD_NUMBER: _ClassVar[int]
    REQUEST_ID_FIELD_NUMBER: _ClassVar[int]
    answer_id: str
    artifacts: _containers.RepeatedCompositeFieldContainer[Artifact]
    created: int
    meta: AnswerMeta
    received: int
    request_id: str
    def __init__(self, answer_id: _Optional[str] = ..., request_id: _Optional[str] = ..., received: _Optional[int] = ..., created: _Optional[int] = ..., meta: _Optional[_Union[AnswerMeta, _Mapping]] = ..., artifacts: _Optional[_Iterable[_Union[Artifact, _Mapping]]] = ...) -> None: ...

class AnswerMeta(_message.Message):
    __slots__ = ["cpu_id", "engine_id", "gpu_id", "node_id"]
    CPU_ID_FIELD_NUMBER: _ClassVar[int]
    ENGINE_ID_FIELD_NUMBER: _ClassVar[int]
    GPU_ID_FIELD_NUMBER: _ClassVar[int]
    NODE_ID_FIELD_NUMBER: _ClassVar[int]
    cpu_id: str
    engine_id: str
    gpu_id: str
    node_id: str
    def __init__(self, gpu_id: _Optional[str] = ..., cpu_id: _Optional[str] = ..., node_id: _Optional[str] = ..., engine_id: _Optional[str] = ...) -> None: ...

class Artifact(_message.Message):
    __slots__ = ["adjustments", "binary", "cache_control", "cache_id", "classifier", "finish_reason", "hint_image_type", "id", "index", "lora", "magic", "mime", "postAdjustments", "ref", "safetensors", "seed", "size", "tensor", "text", "token_embedding", "tokens", "type", "url", "uuid"]
    ADJUSTMENTS_FIELD_NUMBER: _ClassVar[int]
    BINARY_FIELD_NUMBER: _ClassVar[int]
    CACHE_CONTROL_FIELD_NUMBER: _ClassVar[int]
    CACHE_ID_FIELD_NUMBER: _ClassVar[int]
    CLASSIFIER_FIELD_NUMBER: _ClassVar[int]
    FINISH_REASON_FIELD_NUMBER: _ClassVar[int]
    HINT_IMAGE_TYPE_FIELD_NUMBER: _ClassVar[int]
    ID_FIELD_NUMBER: _ClassVar[int]
    INDEX_FIELD_NUMBER: _ClassVar[int]
    LORA_FIELD_NUMBER: _ClassVar[int]
    MAGIC_FIELD_NUMBER: _ClassVar[int]
    MIME_FIELD_NUMBER: _ClassVar[int]
    POSTADJUSTMENTS_FIELD_NUMBER: _ClassVar[int]
    REF_FIELD_NUMBER: _ClassVar[int]
    SAFETENSORS_FIELD_NUMBER: _ClassVar[int]
    SEED_FIELD_NUMBER: _ClassVar[int]
    SIZE_FIELD_NUMBER: _ClassVar[int]
    TENSOR_FIELD_NUMBER: _ClassVar[int]
    TEXT_FIELD_NUMBER: _ClassVar[int]
    TOKENS_FIELD_NUMBER: _ClassVar[int]
    TOKEN_EMBEDDING_FIELD_NUMBER: _ClassVar[int]
    TYPE_FIELD_NUMBER: _ClassVar[int]
    URL_FIELD_NUMBER: _ClassVar[int]
    UUID_FIELD_NUMBER: _ClassVar[int]
    adjustments: _containers.RepeatedCompositeFieldContainer[ImageAdjustment]
    binary: bytes
    cache_control: CacheControl
    cache_id: str
    classifier: ClassifierParameters
    finish_reason: FinishReason
    hint_image_type: str
    id: int
    index: int
    lora: Lora
    magic: str
    mime: str
    postAdjustments: _containers.RepeatedCompositeFieldContainer[ImageAdjustment]
    ref: ArtifactReference
    safetensors: Safetensors
    seed: int
    size: int
    tensor: _tensors_pb2.Tensor
    text: str
    token_embedding: TokenEmbedding
    tokens: Tokens
    type: ArtifactType
    url: str
    uuid: str
    def __init__(self, id: _Optional[int] = ..., type: _Optional[_Union[ArtifactType, str]] = ..., mime: _Optional[str] = ..., magic: _Optional[str] = ..., index: _Optional[int] = ..., finish_reason: _Optional[_Union[FinishReason, str]] = ..., seed: _Optional[int] = ..., uuid: _Optional[str] = ..., size: _Optional[int] = ..., adjustments: _Optional[_Iterable[_Union[ImageAdjustment, _Mapping]]] = ..., postAdjustments: _Optional[_Iterable[_Union[ImageAdjustment, _Mapping]]] = ..., hint_image_type: _Optional[str] = ..., cache_control: _Optional[_Union[CacheControl, _Mapping]] = ..., binary: _Optional[bytes] = ..., text: _Optional[str] = ..., tokens: _Optional[_Union[Tokens, _Mapping]] = ..., classifier: _Optional[_Union[ClassifierParameters, _Mapping]] = ..., tensor: _Optional[_Union[_tensors_pb2.Tensor, _Mapping]] = ..., ref: _Optional[_Union[ArtifactReference, _Mapping]] = ..., url: _Optional[str] = ..., safetensors: _Optional[_Union[Safetensors, _Mapping]] = ..., cache_id: _Optional[str] = ..., lora: _Optional[_Union[Lora, _Mapping]] = ..., token_embedding: _Optional[_Union[TokenEmbedding, _Mapping]] = ...) -> None: ...

class ArtifactReference(_message.Message):
    __slots__ = ["id", "stage", "uuid"]
    ID_FIELD_NUMBER: _ClassVar[int]
    STAGE_FIELD_NUMBER: _ClassVar[int]
    UUID_FIELD_NUMBER: _ClassVar[int]
    id: int
    stage: ArtifactStage
    uuid: str
    def __init__(self, stage: _Optional[_Union[ArtifactStage, str]] = ..., id: _Optional[int] = ..., uuid: _Optional[str] = ...) -> None: ...

class AssetParameters(_message.Message):
    __slots__ = ["action", "project_id", "use"]
    ACTION_FIELD_NUMBER: _ClassVar[int]
    PROJECT_ID_FIELD_NUMBER: _ClassVar[int]
    USE_FIELD_NUMBER: _ClassVar[int]
    action: AssetAction
    project_id: str
    use: AssetUse
    def __init__(self, action: _Optional[_Union[AssetAction, str]] = ..., project_id: _Optional[str] = ..., use: _Optional[_Union[AssetUse, str]] = ...) -> None: ...

class AsyncAnswer(_message.Message):
    __slots__ = ["answer", "complete", "status"]
    ANSWER_FIELD_NUMBER: _ClassVar[int]
    COMPLETE_FIELD_NUMBER: _ClassVar[int]
    STATUS_FIELD_NUMBER: _ClassVar[int]
    answer: _containers.RepeatedCompositeFieldContainer[Answer]
    complete: bool
    status: AsyncStatus
    def __init__(self, answer: _Optional[_Iterable[_Union[Answer, _Mapping]]] = ..., complete: bool = ..., status: _Optional[_Union[AsyncStatus, _Mapping]] = ...) -> None: ...

class AsyncCancelAnswer(_message.Message):
    __slots__ = []
    def __init__(self) -> None: ...

class AsyncHandle(_message.Message):
    __slots__ = ["async_handle", "request_id"]
    ASYNC_HANDLE_FIELD_NUMBER: _ClassVar[int]
    REQUEST_ID_FIELD_NUMBER: _ClassVar[int]
    async_handle: str
    request_id: str
    def __init__(self, request_id: _Optional[str] = ..., async_handle: _Optional[str] = ...) -> None: ...

class AsyncStatus(_message.Message):
    __slots__ = ["code", "message"]
    CODE_FIELD_NUMBER: _ClassVar[int]
    MESSAGE_FIELD_NUMBER: _ClassVar[int]
    code: int
    message: str
    def __init__(self, code: _Optional[int] = ..., message: _Optional[str] = ...) -> None: ...

class CacheControl(_message.Message):
    __slots__ = ["cache_id", "max_age", "stage"]
    CACHE_ID_FIELD_NUMBER: _ClassVar[int]
    MAX_AGE_FIELD_NUMBER: _ClassVar[int]
    STAGE_FIELD_NUMBER: _ClassVar[int]
    cache_id: str
    max_age: int
    stage: ArtifactStage
    def __init__(self, cache_id: _Optional[str] = ..., max_age: _Optional[int] = ..., stage: _Optional[_Union[ArtifactStage, str]] = ...) -> None: ...

class ChainRequest(_message.Message):
    __slots__ = ["request_id", "stage"]
    REQUEST_ID_FIELD_NUMBER: _ClassVar[int]
    STAGE_FIELD_NUMBER: _ClassVar[int]
    request_id: str
    stage: _containers.RepeatedCompositeFieldContainer[Stage]
    def __init__(self, request_id: _Optional[str] = ..., stage: _Optional[_Iterable[_Union[Stage, _Mapping]]] = ...) -> None: ...

class ChurnSettings(_message.Message):
    __slots__ = ["churn", "churn_tmax", "churn_tmin"]
    CHURN_FIELD_NUMBER: _ClassVar[int]
    CHURN_TMAX_FIELD_NUMBER: _ClassVar[int]
    CHURN_TMIN_FIELD_NUMBER: _ClassVar[int]
    churn: float
    churn_tmax: float
    churn_tmin: float
    def __init__(self, churn: _Optional[float] = ..., churn_tmin: _Optional[float] = ..., churn_tmax: _Optional[float] = ...) -> None: ...

class ClassifierCategory(_message.Message):
    __slots__ = ["action", "adjustment", "classifier_mode", "concepts", "name"]
    ACTION_FIELD_NUMBER: _ClassVar[int]
    ADJUSTMENT_FIELD_NUMBER: _ClassVar[int]
    CLASSIFIER_MODE_FIELD_NUMBER: _ClassVar[int]
    CONCEPTS_FIELD_NUMBER: _ClassVar[int]
    NAME_FIELD_NUMBER: _ClassVar[int]
    action: Action
    adjustment: float
    classifier_mode: ClassifierMode
    concepts: _containers.RepeatedCompositeFieldContainer[ClassifierConcept]
    name: str
    def __init__(self, name: _Optional[str] = ..., concepts: _Optional[_Iterable[_Union[ClassifierConcept, _Mapping]]] = ..., adjustment: _Optional[float] = ..., action: _Optional[_Union[Action, str]] = ..., classifier_mode: _Optional[_Union[ClassifierMode, str]] = ...) -> None: ...

class ClassifierConcept(_message.Message):
    __slots__ = ["concept", "threshold"]
    CONCEPT_FIELD_NUMBER: _ClassVar[int]
    THRESHOLD_FIELD_NUMBER: _ClassVar[int]
    concept: str
    threshold: float
    def __init__(self, concept: _Optional[str] = ..., threshold: _Optional[float] = ...) -> None: ...

class ClassifierParameters(_message.Message):
    __slots__ = ["categories", "exceeds", "realized_action"]
    CATEGORIES_FIELD_NUMBER: _ClassVar[int]
    EXCEEDS_FIELD_NUMBER: _ClassVar[int]
    REALIZED_ACTION_FIELD_NUMBER: _ClassVar[int]
    categories: _containers.RepeatedCompositeFieldContainer[ClassifierCategory]
    exceeds: _containers.RepeatedCompositeFieldContainer[ClassifierCategory]
    realized_action: Action
    def __init__(self, categories: _Optional[_Iterable[_Union[ClassifierCategory, _Mapping]]] = ..., exceeds: _Optional[_Iterable[_Union[ClassifierCategory, _Mapping]]] = ..., realized_action: _Optional[_Union[Action, str]] = ...) -> None: ...

class ConditionerParameters(_message.Message):
    __slots__ = ["conditioner", "vector_adjust_prior"]
    CONDITIONER_FIELD_NUMBER: _ClassVar[int]
    VECTOR_ADJUST_PRIOR_FIELD_NUMBER: _ClassVar[int]
    conditioner: Model
    vector_adjust_prior: str
    def __init__(self, vector_adjust_prior: _Optional[str] = ..., conditioner: _Optional[_Union[Model, _Mapping]] = ...) -> None: ...

class CutoutParameters(_message.Message):
    __slots__ = ["blur", "count", "cutouts", "gray", "size_power"]
    BLUR_FIELD_NUMBER: _ClassVar[int]
    COUNT_FIELD_NUMBER: _ClassVar[int]
    CUTOUTS_FIELD_NUMBER: _ClassVar[int]
    GRAY_FIELD_NUMBER: _ClassVar[int]
    SIZE_POWER_FIELD_NUMBER: _ClassVar[int]
    blur: float
    count: int
    cutouts: _containers.RepeatedCompositeFieldContainer[CutoutParameters]
    gray: float
    size_power: float
    def __init__(self, cutouts: _Optional[_Iterable[_Union[CutoutParameters, _Mapping]]] = ..., count: _Optional[int] = ..., gray: _Optional[float] = ..., blur: _Optional[float] = ..., size_power: _Optional[float] = ...) -> None: ...

class ExtendedParameter(_message.Message):
    __slots__ = ["float", "int", "name", "str"]
    FLOAT_FIELD_NUMBER: _ClassVar[int]
    INT_FIELD_NUMBER: _ClassVar[int]
    NAME_FIELD_NUMBER: _ClassVar[int]
    STR_FIELD_NUMBER: _ClassVar[int]
    float: float
    int: int
    name: str
    str: str
    def __init__(self, name: _Optional[str] = ..., float: _Optional[float] = ..., int: _Optional[int] = ..., str: _Optional[str] = ...) -> None: ...

class ExtendedParameters(_message.Message):
    __slots__ = ["parameters"]
    PARAMETERS_FIELD_NUMBER: _ClassVar[int]
    parameters: _containers.RepeatedCompositeFieldContainer[ExtendedParameter]
    def __init__(self, parameters: _Optional[_Iterable[_Union[ExtendedParameter, _Mapping]]] = ...) -> None: ...

class GuidanceInstanceParameters(_message.Message):
    __slots__ = ["cutouts", "guidance_strength", "models", "prompt", "schedule"]
    CUTOUTS_FIELD_NUMBER: _ClassVar[int]
    GUIDANCE_STRENGTH_FIELD_NUMBER: _ClassVar[int]
    MODELS_FIELD_NUMBER: _ClassVar[int]
    PROMPT_FIELD_NUMBER: _ClassVar[int]
    SCHEDULE_FIELD_NUMBER: _ClassVar[int]
    cutouts: CutoutParameters
    guidance_strength: float
    models: _containers.RepeatedCompositeFieldContainer[Model]
    prompt: Prompt
    schedule: _containers.RepeatedCompositeFieldContainer[GuidanceScheduleParameters]
    def __init__(self, models: _Optional[_Iterable[_Union[Model, _Mapping]]] = ..., guidance_strength: _Optional[float] = ..., schedule: _Optional[_Iterable[_Union[GuidanceScheduleParameters, _Mapping]]] = ..., cutouts: _Optional[_Union[CutoutParameters, _Mapping]] = ..., prompt: _Optional[_Union[Prompt, _Mapping]] = ...) -> None: ...

class GuidanceParameters(_message.Message):
    __slots__ = ["guidance_preset", "instances"]
    GUIDANCE_PRESET_FIELD_NUMBER: _ClassVar[int]
    INSTANCES_FIELD_NUMBER: _ClassVar[int]
    guidance_preset: GuidancePreset
    instances: _containers.RepeatedCompositeFieldContainer[GuidanceInstanceParameters]
    def __init__(self, guidance_preset: _Optional[_Union[GuidancePreset, str]] = ..., instances: _Optional[_Iterable[_Union[GuidanceInstanceParameters, _Mapping]]] = ...) -> None: ...

class GuidanceScheduleParameters(_message.Message):
    __slots__ = ["duration", "value"]
    DURATION_FIELD_NUMBER: _ClassVar[int]
    VALUE_FIELD_NUMBER: _ClassVar[int]
    duration: float
    value: float
    def __init__(self, duration: _Optional[float] = ..., value: _Optional[float] = ...) -> None: ...

class HiresFixParameters(_message.Message):
    __slots__ = ["enable", "oos_fraction"]
    ENABLE_FIELD_NUMBER: _ClassVar[int]
    OOS_FRACTION_FIELD_NUMBER: _ClassVar[int]
    enable: bool
    oos_fraction: float
    def __init__(self, enable: bool = ..., oos_fraction: _Optional[float] = ...) -> None: ...

class ImageAdjustment(_message.Message):
    __slots__ = ["autoscale", "background_removal", "blur", "canny_edge", "channels", "crop", "depth", "edge_detection", "engine_id", "invert", "keypose", "levels", "normal", "openpose", "palletize", "quantize", "rescale", "segmentation", "shuffle"]
    AUTOSCALE_FIELD_NUMBER: _ClassVar[int]
    BACKGROUND_REMOVAL_FIELD_NUMBER: _ClassVar[int]
    BLUR_FIELD_NUMBER: _ClassVar[int]
    CANNY_EDGE_FIELD_NUMBER: _ClassVar[int]
    CHANNELS_FIELD_NUMBER: _ClassVar[int]
    CROP_FIELD_NUMBER: _ClassVar[int]
    DEPTH_FIELD_NUMBER: _ClassVar[int]
    EDGE_DETECTION_FIELD_NUMBER: _ClassVar[int]
    ENGINE_ID_FIELD_NUMBER: _ClassVar[int]
    INVERT_FIELD_NUMBER: _ClassVar[int]
    KEYPOSE_FIELD_NUMBER: _ClassVar[int]
    LEVELS_FIELD_NUMBER: _ClassVar[int]
    NORMAL_FIELD_NUMBER: _ClassVar[int]
    OPENPOSE_FIELD_NUMBER: _ClassVar[int]
    PALLETIZE_FIELD_NUMBER: _ClassVar[int]
    QUANTIZE_FIELD_NUMBER: _ClassVar[int]
    RESCALE_FIELD_NUMBER: _ClassVar[int]
    SEGMENTATION_FIELD_NUMBER: _ClassVar[int]
    SHUFFLE_FIELD_NUMBER: _ClassVar[int]
    autoscale: ImageAdjustment_Autoscale
    background_removal: ImageAdjustment_BackgroundRemoval
    blur: ImageAdjustment_Gaussian
    canny_edge: ImageAdjustment_CannyEdge
    channels: ImageAdjustment_Channels
    crop: ImageAdjustment_Crop
    depth: ImageAdjustment_Depth
    edge_detection: ImageAdjustment_EdgeDetection
    engine_id: str
    invert: ImageAdjustment_Invert
    keypose: ImageAdjustment_Keypose
    levels: ImageAdjustment_Levels
    normal: ImageAdjustment_Normal
    openpose: ImageAdjustment_Openpose
    palletize: ImageAdjustment_Palletize
    quantize: ImageAdjustment_Quantize
    rescale: ImageAdjustment_Rescale
    segmentation: ImageAdjustment_Segmentation
    shuffle: ImageAdjustment_Shuffle
    def __init__(self, engine_id: _Optional[str] = ..., blur: _Optional[_Union[ImageAdjustment_Gaussian, _Mapping]] = ..., invert: _Optional[_Union[ImageAdjustment_Invert, _Mapping]] = ..., levels: _Optional[_Union[ImageAdjustment_Levels, _Mapping]] = ..., channels: _Optional[_Union[ImageAdjustment_Channels, _Mapping]] = ..., rescale: _Optional[_Union[ImageAdjustment_Rescale, _Mapping]] = ..., crop: _Optional[_Union[ImageAdjustment_Crop, _Mapping]] = ..., depth: _Optional[_Union[ImageAdjustment_Depth, _Mapping]] = ..., canny_edge: _Optional[_Union[ImageAdjustment_CannyEdge, _Mapping]] = ..., edge_detection: _Optional[_Union[ImageAdjustment_EdgeDetection, _Mapping]] = ..., segmentation: _Optional[_Union[ImageAdjustment_Segmentation, _Mapping]] = ..., keypose: _Optional[_Union[ImageAdjustment_Keypose, _Mapping]] = ..., openpose: _Optional[_Union[ImageAdjustment_Openpose, _Mapping]] = ..., normal: _Optional[_Union[ImageAdjustment_Normal, _Mapping]] = ..., background_removal: _Optional[_Union[ImageAdjustment_BackgroundRemoval, _Mapping]] = ..., autoscale: _Optional[_Union[ImageAdjustment_Autoscale, _Mapping]] = ..., palletize: _Optional[_Union[ImageAdjustment_Palletize, _Mapping]] = ..., quantize: _Optional[_Union[ImageAdjustment_Quantize, _Mapping]] = ..., shuffle: _Optional[_Union[ImageAdjustment_Shuffle, _Mapping]] = ...) -> None: ...

class ImageAdjustment_Autoscale(_message.Message):
    __slots__ = ["height", "mode", "width"]
    HEIGHT_FIELD_NUMBER: _ClassVar[int]
    MODE_FIELD_NUMBER: _ClassVar[int]
    WIDTH_FIELD_NUMBER: _ClassVar[int]
    height: int
    mode: RescaleMode
    width: int
    def __init__(self, height: _Optional[int] = ..., width: _Optional[int] = ..., mode: _Optional[_Union[RescaleMode, str]] = ...) -> None: ...

class ImageAdjustment_BackgroundRemoval(_message.Message):
    __slots__ = ["mode", "reapply"]
    MODE_FIELD_NUMBER: _ClassVar[int]
    REAPPLY_FIELD_NUMBER: _ClassVar[int]
    mode: BackgroundRemovalMode
    reapply: bool
    def __init__(self, mode: _Optional[_Union[BackgroundRemovalMode, str]] = ..., reapply: bool = ...) -> None: ...

class ImageAdjustment_CannyEdge(_message.Message):
    __slots__ = ["high_threshold", "low_threshold"]
    HIGH_THRESHOLD_FIELD_NUMBER: _ClassVar[int]
    LOW_THRESHOLD_FIELD_NUMBER: _ClassVar[int]
    high_threshold: float
    low_threshold: float
    def __init__(self, low_threshold: _Optional[float] = ..., high_threshold: _Optional[float] = ...) -> None: ...

class ImageAdjustment_Channels(_message.Message):
    __slots__ = ["a", "b", "g", "r"]
    A_FIELD_NUMBER: _ClassVar[int]
    B_FIELD_NUMBER: _ClassVar[int]
    G_FIELD_NUMBER: _ClassVar[int]
    R_FIELD_NUMBER: _ClassVar[int]
    a: ChannelSource
    b: ChannelSource
    g: ChannelSource
    r: ChannelSource
    def __init__(self, r: _Optional[_Union[ChannelSource, str]] = ..., g: _Optional[_Union[ChannelSource, str]] = ..., b: _Optional[_Union[ChannelSource, str]] = ..., a: _Optional[_Union[ChannelSource, str]] = ...) -> None: ...

class ImageAdjustment_Crop(_message.Message):
    __slots__ = ["height", "left", "top", "width"]
    HEIGHT_FIELD_NUMBER: _ClassVar[int]
    LEFT_FIELD_NUMBER: _ClassVar[int]
    TOP_FIELD_NUMBER: _ClassVar[int]
    WIDTH_FIELD_NUMBER: _ClassVar[int]
    height: int
    left: int
    top: int
    width: int
    def __init__(self, top: _Optional[int] = ..., left: _Optional[int] = ..., width: _Optional[int] = ..., height: _Optional[int] = ...) -> None: ...

class ImageAdjustment_Depth(_message.Message):
    __slots__ = ["depth_engine_hint"]
    DEPTH_ENGINE_HINT_FIELD_NUMBER: _ClassVar[int]
    depth_engine_hint: _containers.RepeatedScalarFieldContainer[str]
    def __init__(self, depth_engine_hint: _Optional[_Iterable[str]] = ...) -> None: ...

class ImageAdjustment_EdgeDetection(_message.Message):
    __slots__ = []
    def __init__(self) -> None: ...

class ImageAdjustment_Gaussian(_message.Message):
    __slots__ = ["direction", "sigma"]
    DIRECTION_FIELD_NUMBER: _ClassVar[int]
    SIGMA_FIELD_NUMBER: _ClassVar[int]
    direction: GaussianDirection
    sigma: float
    def __init__(self, sigma: _Optional[float] = ..., direction: _Optional[_Union[GaussianDirection, str]] = ...) -> None: ...

class ImageAdjustment_Invert(_message.Message):
    __slots__ = []
    def __init__(self) -> None: ...

class ImageAdjustment_Keypose(_message.Message):
    __slots__ = []
    def __init__(self) -> None: ...

class ImageAdjustment_Levels(_message.Message):
    __slots__ = ["input_high", "input_low", "output_high", "output_low"]
    INPUT_HIGH_FIELD_NUMBER: _ClassVar[int]
    INPUT_LOW_FIELD_NUMBER: _ClassVar[int]
    OUTPUT_HIGH_FIELD_NUMBER: _ClassVar[int]
    OUTPUT_LOW_FIELD_NUMBER: _ClassVar[int]
    input_high: float
    input_low: float
    output_high: float
    output_low: float
    def __init__(self, input_low: _Optional[float] = ..., input_high: _Optional[float] = ..., output_low: _Optional[float] = ..., output_high: _Optional[float] = ...) -> None: ...

class ImageAdjustment_Normal(_message.Message):
    __slots__ = ["background_threshold", "postblur", "preblur", "smoothing"]
    BACKGROUND_THRESHOLD_FIELD_NUMBER: _ClassVar[int]
    POSTBLUR_FIELD_NUMBER: _ClassVar[int]
    PREBLUR_FIELD_NUMBER: _ClassVar[int]
    SMOOTHING_FIELD_NUMBER: _ClassVar[int]
    background_threshold: float
    postblur: int
    preblur: int
    smoothing: float
    def __init__(self, background_threshold: _Optional[float] = ..., preblur: _Optional[int] = ..., postblur: _Optional[int] = ..., smoothing: _Optional[float] = ...) -> None: ...

class ImageAdjustment_Openpose(_message.Message):
    __slots__ = []
    def __init__(self) -> None: ...

class ImageAdjustment_Palletize(_message.Message):
    __slots__ = ["colours"]
    COLOURS_FIELD_NUMBER: _ClassVar[int]
    colours: int
    def __init__(self, colours: _Optional[int] = ...) -> None: ...

class ImageAdjustment_Quantize(_message.Message):
    __slots__ = ["threshold"]
    THRESHOLD_FIELD_NUMBER: _ClassVar[int]
    threshold: _containers.RepeatedScalarFieldContainer[float]
    def __init__(self, threshold: _Optional[_Iterable[float]] = ...) -> None: ...

class ImageAdjustment_Rescale(_message.Message):
    __slots__ = ["algorithm_hint", "height", "mode", "width"]
    ALGORITHM_HINT_FIELD_NUMBER: _ClassVar[int]
    HEIGHT_FIELD_NUMBER: _ClassVar[int]
    MODE_FIELD_NUMBER: _ClassVar[int]
    WIDTH_FIELD_NUMBER: _ClassVar[int]
    algorithm_hint: _containers.RepeatedScalarFieldContainer[str]
    height: int
    mode: RescaleMode
    width: int
    def __init__(self, height: _Optional[int] = ..., width: _Optional[int] = ..., mode: _Optional[_Union[RescaleMode, str]] = ..., algorithm_hint: _Optional[_Iterable[str]] = ...) -> None: ...

class ImageAdjustment_Segmentation(_message.Message):
    __slots__ = []
    def __init__(self) -> None: ...

class ImageAdjustment_Shuffle(_message.Message):
    __slots__ = []
    def __init__(self) -> None: ...

class ImageParameters(_message.Message):
    __slots__ = ["extension", "height", "hires", "masked_area_init", "parameters", "quantize", "samples", "seed", "steps", "tiling", "tiling_x", "tiling_y", "transform", "weight_method", "width"]
    EXTENSION_FIELD_NUMBER: _ClassVar[int]
    HEIGHT_FIELD_NUMBER: _ClassVar[int]
    HIRES_FIELD_NUMBER: _ClassVar[int]
    MASKED_AREA_INIT_FIELD_NUMBER: _ClassVar[int]
    PARAMETERS_FIELD_NUMBER: _ClassVar[int]
    QUANTIZE_FIELD_NUMBER: _ClassVar[int]
    SAMPLES_FIELD_NUMBER: _ClassVar[int]
    SEED_FIELD_NUMBER: _ClassVar[int]
    STEPS_FIELD_NUMBER: _ClassVar[int]
    TILING_FIELD_NUMBER: _ClassVar[int]
    TILING_X_FIELD_NUMBER: _ClassVar[int]
    TILING_Y_FIELD_NUMBER: _ClassVar[int]
    TRANSFORM_FIELD_NUMBER: _ClassVar[int]
    WEIGHT_METHOD_FIELD_NUMBER: _ClassVar[int]
    WIDTH_FIELD_NUMBER: _ClassVar[int]
    extension: ExtendedParameters
    height: int
    hires: HiresFixParameters
    masked_area_init: MaskedAreaInit
    parameters: _containers.RepeatedCompositeFieldContainer[StepParameter]
    quantize: bool
    samples: int
    seed: _containers.RepeatedScalarFieldContainer[int]
    steps: int
    tiling: bool
    tiling_x: bool
    tiling_y: bool
    transform: TransformType
    weight_method: WeightMethod
    width: int
    def __init__(self, height: _Optional[int] = ..., width: _Optional[int] = ..., seed: _Optional[_Iterable[int]] = ..., samples: _Optional[int] = ..., steps: _Optional[int] = ..., transform: _Optional[_Union[TransformType, _Mapping]] = ..., parameters: _Optional[_Iterable[_Union[StepParameter, _Mapping]]] = ..., masked_area_init: _Optional[_Union[MaskedAreaInit, str]] = ..., weight_method: _Optional[_Union[WeightMethod, str]] = ..., quantize: bool = ..., extension: _Optional[_Union[ExtendedParameters, _Mapping]] = ..., hires: _Optional[_Union[HiresFixParameters, _Mapping]] = ..., tiling: bool = ..., tiling_x: bool = ..., tiling_y: bool = ...) -> None: ...

class Lora(_message.Message):
    __slots__ = ["lora", "weights"]
    LORA_FIELD_NUMBER: _ClassVar[int]
    WEIGHTS_FIELD_NUMBER: _ClassVar[int]
    lora: Safetensors
    weights: _containers.RepeatedCompositeFieldContainer[LoraWeight]
    def __init__(self, lora: _Optional[_Union[Safetensors, _Mapping]] = ..., weights: _Optional[_Iterable[_Union[LoraWeight, _Mapping]]] = ...) -> None: ...

class LoraWeight(_message.Message):
    __slots__ = ["model_name", "weight"]
    MODEL_NAME_FIELD_NUMBER: _ClassVar[int]
    WEIGHT_FIELD_NUMBER: _ClassVar[int]
    model_name: str
    weight: float
    def __init__(self, model_name: _Optional[str] = ..., weight: _Optional[float] = ...) -> None: ...

class Model(_message.Message):
    __slots__ = ["alias", "architecture", "dataset", "publisher", "semantic_version", "version"]
    ALIAS_FIELD_NUMBER: _ClassVar[int]
    ARCHITECTURE_FIELD_NUMBER: _ClassVar[int]
    DATASET_FIELD_NUMBER: _ClassVar[int]
    PUBLISHER_FIELD_NUMBER: _ClassVar[int]
    SEMANTIC_VERSION_FIELD_NUMBER: _ClassVar[int]
    VERSION_FIELD_NUMBER: _ClassVar[int]
    alias: str
    architecture: ModelArchitecture
    dataset: str
    publisher: str
    semantic_version: str
    version: float
    def __init__(self, architecture: _Optional[_Union[ModelArchitecture, str]] = ..., publisher: _Optional[str] = ..., dataset: _Optional[str] = ..., version: _Optional[float] = ..., semantic_version: _Optional[str] = ..., alias: _Optional[str] = ...) -> None: ...

class NamedWeight(_message.Message):
    __slots__ = ["name", "weight"]
    NAME_FIELD_NUMBER: _ClassVar[int]
    WEIGHT_FIELD_NUMBER: _ClassVar[int]
    name: str
    weight: float
    def __init__(self, name: _Optional[str] = ..., weight: _Optional[float] = ...) -> None: ...

class OnStatus(_message.Message):
    __slots__ = ["action", "reason", "target"]
    ACTION_FIELD_NUMBER: _ClassVar[int]
    REASON_FIELD_NUMBER: _ClassVar[int]
    TARGET_FIELD_NUMBER: _ClassVar[int]
    action: _containers.RepeatedScalarFieldContainer[StageAction]
    reason: _containers.RepeatedScalarFieldContainer[FinishReason]
    target: str
    def __init__(self, reason: _Optional[_Iterable[_Union[FinishReason, str]]] = ..., target: _Optional[str] = ..., action: _Optional[_Iterable[_Union[StageAction, str]]] = ...) -> None: ...

class Prompt(_message.Message):
    __slots__ = ["artifact", "echo_back", "parameters", "text", "tokens"]
    ARTIFACT_FIELD_NUMBER: _ClassVar[int]
    ECHO_BACK_FIELD_NUMBER: _ClassVar[int]
    PARAMETERS_FIELD_NUMBER: _ClassVar[int]
    TEXT_FIELD_NUMBER: _ClassVar[int]
    TOKENS_FIELD_NUMBER: _ClassVar[int]
    artifact: Artifact
    echo_back: bool
    parameters: PromptParameters
    text: str
    tokens: Tokens
    def __init__(self, parameters: _Optional[_Union[PromptParameters, _Mapping]] = ..., echo_back: bool = ..., text: _Optional[str] = ..., tokens: _Optional[_Union[Tokens, _Mapping]] = ..., artifact: _Optional[_Union[Artifact, _Mapping]] = ...) -> None: ...

class PromptParameters(_message.Message):
    __slots__ = ["clip_layer", "hint_priority", "init", "named_weights", "token_overrides", "weight"]
    CLIP_LAYER_FIELD_NUMBER: _ClassVar[int]
    HINT_PRIORITY_FIELD_NUMBER: _ClassVar[int]
    INIT_FIELD_NUMBER: _ClassVar[int]
    NAMED_WEIGHTS_FIELD_NUMBER: _ClassVar[int]
    TOKEN_OVERRIDES_FIELD_NUMBER: _ClassVar[int]
    WEIGHT_FIELD_NUMBER: _ClassVar[int]
    clip_layer: int
    hint_priority: HintPriority
    init: bool
    named_weights: _containers.RepeatedCompositeFieldContainer[NamedWeight]
    token_overrides: _containers.RepeatedCompositeFieldContainer[TokenOverride]
    weight: float
    def __init__(self, init: bool = ..., weight: _Optional[float] = ..., named_weights: _Optional[_Iterable[_Union[NamedWeight, _Mapping]]] = ..., token_overrides: _Optional[_Iterable[_Union[TokenOverride, _Mapping]]] = ..., clip_layer: _Optional[int] = ..., hint_priority: _Optional[_Union[HintPriority, str]] = ...) -> None: ...

class Request(_message.Message):
    __slots__ = ["accept", "asset", "classifier", "conditioner", "engine_id", "image", "prompt", "request_id", "requested_type"]
    ACCEPT_FIELD_NUMBER: _ClassVar[int]
    ASSET_FIELD_NUMBER: _ClassVar[int]
    CLASSIFIER_FIELD_NUMBER: _ClassVar[int]
    CONDITIONER_FIELD_NUMBER: _ClassVar[int]
    ENGINE_ID_FIELD_NUMBER: _ClassVar[int]
    IMAGE_FIELD_NUMBER: _ClassVar[int]
    PROMPT_FIELD_NUMBER: _ClassVar[int]
    REQUESTED_TYPE_FIELD_NUMBER: _ClassVar[int]
    REQUEST_ID_FIELD_NUMBER: _ClassVar[int]
    accept: str
    asset: AssetParameters
    classifier: ClassifierParameters
    conditioner: ConditionerParameters
    engine_id: str
    image: ImageParameters
    prompt: _containers.RepeatedCompositeFieldContainer[Prompt]
    request_id: str
    requested_type: ArtifactType
    def __init__(self, engine_id: _Optional[str] = ..., request_id: _Optional[str] = ..., requested_type: _Optional[_Union[ArtifactType, str]] = ..., prompt: _Optional[_Iterable[_Union[Prompt, _Mapping]]] = ..., conditioner: _Optional[_Union[ConditionerParameters, _Mapping]] = ..., accept: _Optional[str] = ..., image: _Optional[_Union[ImageParameters, _Mapping]] = ..., classifier: _Optional[_Union[ClassifierParameters, _Mapping]] = ..., asset: _Optional[_Union[AssetParameters, _Mapping]] = ...) -> None: ...

class Safetensors(_message.Message):
    __slots__ = ["metadata", "tensors"]
    METADATA_FIELD_NUMBER: _ClassVar[int]
    TENSORS_FIELD_NUMBER: _ClassVar[int]
    metadata: _containers.RepeatedCompositeFieldContainer[SafetensorsMeta]
    tensors: _containers.RepeatedCompositeFieldContainer[SafetensorsTensor]
    def __init__(self, metadata: _Optional[_Iterable[_Union[SafetensorsMeta, _Mapping]]] = ..., tensors: _Optional[_Iterable[_Union[SafetensorsTensor, _Mapping]]] = ...) -> None: ...

class SafetensorsMeta(_message.Message):
    __slots__ = ["key", "value"]
    KEY_FIELD_NUMBER: _ClassVar[int]
    VALUE_FIELD_NUMBER: _ClassVar[int]
    key: str
    value: str
    def __init__(self, key: _Optional[str] = ..., value: _Optional[str] = ...) -> None: ...

class SafetensorsTensor(_message.Message):
    __slots__ = ["key", "tensor"]
    KEY_FIELD_NUMBER: _ClassVar[int]
    TENSOR_FIELD_NUMBER: _ClassVar[int]
    key: str
    tensor: _tensors_pb2.Tensor
    def __init__(self, key: _Optional[str] = ..., tensor: _Optional[_Union[_tensors_pb2.Tensor, _Mapping]] = ...) -> None: ...

class SamplerParameters(_message.Message):
    __slots__ = ["cfg_scale", "churn", "downsampling_factor", "eta", "init_noise_scale", "latent_channels", "noise_type", "sampling_steps", "sigma", "step_noise_scale"]
    CFG_SCALE_FIELD_NUMBER: _ClassVar[int]
    CHURN_FIELD_NUMBER: _ClassVar[int]
    DOWNSAMPLING_FACTOR_FIELD_NUMBER: _ClassVar[int]
    ETA_FIELD_NUMBER: _ClassVar[int]
    INIT_NOISE_SCALE_FIELD_NUMBER: _ClassVar[int]
    LATENT_CHANNELS_FIELD_NUMBER: _ClassVar[int]
    NOISE_TYPE_FIELD_NUMBER: _ClassVar[int]
    SAMPLING_STEPS_FIELD_NUMBER: _ClassVar[int]
    SIGMA_FIELD_NUMBER: _ClassVar[int]
    STEP_NOISE_SCALE_FIELD_NUMBER: _ClassVar[int]
    cfg_scale: float
    churn: ChurnSettings
    downsampling_factor: int
    eta: float
    init_noise_scale: float
    latent_channels: int
    noise_type: SamplerNoiseType
    sampling_steps: int
    sigma: SigmaParameters
    step_noise_scale: float
    def __init__(self, eta: _Optional[float] = ..., sampling_steps: _Optional[int] = ..., latent_channels: _Optional[int] = ..., downsampling_factor: _Optional[int] = ..., cfg_scale: _Optional[float] = ..., init_noise_scale: _Optional[float] = ..., step_noise_scale: _Optional[float] = ..., churn: _Optional[_Union[ChurnSettings, _Mapping]] = ..., sigma: _Optional[_Union[SigmaParameters, _Mapping]] = ..., noise_type: _Optional[_Union[SamplerNoiseType, str]] = ...) -> None: ...

class ScheduleParameters(_message.Message):
    __slots__ = ["end", "start", "value"]
    END_FIELD_NUMBER: _ClassVar[int]
    START_FIELD_NUMBER: _ClassVar[int]
    VALUE_FIELD_NUMBER: _ClassVar[int]
    end: float
    start: float
    value: float
    def __init__(self, start: _Optional[float] = ..., end: _Optional[float] = ..., value: _Optional[float] = ...) -> None: ...

class SigmaParameters(_message.Message):
    __slots__ = ["karras_rho", "sigma_max", "sigma_min"]
    KARRAS_RHO_FIELD_NUMBER: _ClassVar[int]
    SIGMA_MAX_FIELD_NUMBER: _ClassVar[int]
    SIGMA_MIN_FIELD_NUMBER: _ClassVar[int]
    karras_rho: float
    sigma_max: float
    sigma_min: float
    def __init__(self, sigma_min: _Optional[float] = ..., sigma_max: _Optional[float] = ..., karras_rho: _Optional[float] = ...) -> None: ...

class Stage(_message.Message):
    __slots__ = ["id", "on_status", "request"]
    ID_FIELD_NUMBER: _ClassVar[int]
    ON_STATUS_FIELD_NUMBER: _ClassVar[int]
    REQUEST_FIELD_NUMBER: _ClassVar[int]
    id: str
    on_status: _containers.RepeatedCompositeFieldContainer[OnStatus]
    request: Request
    def __init__(self, id: _Optional[str] = ..., request: _Optional[_Union[Request, _Mapping]] = ..., on_status: _Optional[_Iterable[_Union[OnStatus, _Mapping]]] = ...) -> None: ...

class StepParameter(_message.Message):
    __slots__ = ["guidance", "sampler", "scaled_step", "schedule"]
    GUIDANCE_FIELD_NUMBER: _ClassVar[int]
    SAMPLER_FIELD_NUMBER: _ClassVar[int]
    SCALED_STEP_FIELD_NUMBER: _ClassVar[int]
    SCHEDULE_FIELD_NUMBER: _ClassVar[int]
    guidance: GuidanceParameters
    sampler: SamplerParameters
    scaled_step: float
    schedule: ScheduleParameters
    def __init__(self, scaled_step: _Optional[float] = ..., sampler: _Optional[_Union[SamplerParameters, _Mapping]] = ..., schedule: _Optional[_Union[ScheduleParameters, _Mapping]] = ..., guidance: _Optional[_Union[GuidanceParameters, _Mapping]] = ...) -> None: ...

class Token(_message.Message):
    __slots__ = ["id", "text"]
    ID_FIELD_NUMBER: _ClassVar[int]
    TEXT_FIELD_NUMBER: _ClassVar[int]
    id: int
    text: str
    def __init__(self, text: _Optional[str] = ..., id: _Optional[int] = ...) -> None: ...

class TokenEmbedding(_message.Message):
    __slots__ = ["tensor", "text"]
    TENSOR_FIELD_NUMBER: _ClassVar[int]
    TEXT_FIELD_NUMBER: _ClassVar[int]
    tensor: _tensors_pb2.Tensor
    text: str
    def __init__(self, text: _Optional[str] = ..., tensor: _Optional[_Union[_tensors_pb2.Tensor, _Mapping]] = ...) -> None: ...

class TokenOverride(_message.Message):
    __slots__ = ["original_token", "token"]
    ORIGINAL_TOKEN_FIELD_NUMBER: _ClassVar[int]
    TOKEN_FIELD_NUMBER: _ClassVar[int]
    original_token: str
    token: str
    def __init__(self, token: _Optional[str] = ..., original_token: _Optional[str] = ...) -> None: ...

class Tokens(_message.Message):
    __slots__ = ["tokenizer_id", "tokens"]
    TOKENIZER_ID_FIELD_NUMBER: _ClassVar[int]
    TOKENS_FIELD_NUMBER: _ClassVar[int]
    tokenizer_id: str
    tokens: _containers.RepeatedCompositeFieldContainer[Token]
    def __init__(self, tokens: _Optional[_Iterable[_Union[Token, _Mapping]]] = ..., tokenizer_id: _Optional[str] = ...) -> None: ...

class TransformType(_message.Message):
    __slots__ = ["diffusion", "upscaler"]
    DIFFUSION_FIELD_NUMBER: _ClassVar[int]
    UPSCALER_FIELD_NUMBER: _ClassVar[int]
    diffusion: DiffusionSampler
    upscaler: Upscaler
    def __init__(self, diffusion: _Optional[_Union[DiffusionSampler, str]] = ..., upscaler: _Optional[_Union[Upscaler, str]] = ...) -> None: ...

class FinishReason(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class ArtifactType(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class GaussianDirection(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class ChannelSource(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class RescaleMode(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class BackgroundRemovalMode(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class ArtifactStage(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class MaskedAreaInit(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class WeightMethod(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class HintPriority(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class DiffusionSampler(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class SamplerNoiseType(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class Upscaler(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class GuidancePreset(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class ModelArchitecture(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class Action(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class ClassifierMode(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class AssetAction(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class AssetUse(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []

class StageAction(int, metaclass=_enum_type_wrapper.EnumTypeWrapper):
    __slots__ = []
