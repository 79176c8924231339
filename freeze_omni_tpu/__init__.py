"""freeze_omni_tpu: a TPU-native streaming speech-to-speech framework.

Re-implements the capabilities of TheDoctor-JI/Freeze-Omni (frozen-LLM duplex
speech dialogue: streaming speech encoder -> adapter -> frozen Qwen2-class LLM
with a dialog-state head -> AR speech-token decoder -> codec vocoder) as an
idiomatic JAX/XLA/Pallas stack: pure functional model cores, fixed-shape
streaming cache pytrees, pjit/shard_map parallelism over a device mesh, and a
continuous-batching runtime instead of replica pools.
"""

__version__ = "0.1.0"
