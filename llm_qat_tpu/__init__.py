"""llm_qat_tpu — TPU-native data-free Quantization-Aware Training framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
JingyangXiang/LLM-QAT (arXiv:2305.17888): W/A/KV fake-quantization with STE,
quantized LLaMA models, KD-QAT training with FSDP sharding over a device
mesh, data-free synthesis from an fp teacher, zero-shot evaluation, and a
true low-bit inference engine.
"""

__version__ = "0.1.0"
