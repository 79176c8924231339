"""freeze_omni_tpu: a TPU-native streaming speech-to-speech framework.

Re-implements the capabilities of TheDoctor-JI/Freeze-Omni (frozen-LLM duplex
speech dialogue: streaming speech encoder -> adapter -> frozen Qwen2-class LLM
with a dialog-state head -> AR speech-token decoder -> codec vocoder) as an
idiomatic JAX/XLA/Pallas stack: pure functional model cores, fixed-shape
streaming cache pytrees, pjit/shard_map parallelism over a device mesh, and a
continuous-batching runtime instead of replica pools.

Public entry points (lazily imported to keep `import freeze_omni_tpu` light):

    from freeze_omni_tpu import (SystemConfig, tiny_system, flagship_system,
                                 InferencePipeline, DuplexPipeline,
                                 ServingEngine, DuplexService, StreamingTTS)
"""

__version__ = "0.1.0"

from .config import (SystemConfig, flagship_system, load_system_config,  # noqa: F401
                     tiny_system)

__all__ = [
    "SystemConfig", "tiny_system", "flagship_system", "load_system_config",
    "InferencePipeline", "DuplexPipeline", "ServingEngine", "DuplexService",
    "StreamingTTS",
]


def __getattr__(name):  # lazy heavyweight imports
    if name in ("InferencePipeline", "DuplexPipeline"):
        from . import pipeline

        return getattr(pipeline, name)
    if name == "ServingEngine":
        from .runtime.engine import ServingEngine

        return ServingEngine
    if name == "DuplexService":
        from .runtime.service import DuplexService

        return DuplexService
    if name == "StreamingTTS":
        from .tts import StreamingTTS

        return StreamingTTS
    raise AttributeError(name)
