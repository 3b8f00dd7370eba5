"""guidedquant_tpu — a TPU-native (JAX/XLA/Pallas) re-design of GuidedQuant.

End-loss-guided post-training LLM quantization and serving:

- ``calib``     gradient/saliency capture + saliency-weighted layerwise Hessians
- ``solvers``   seed k-means, LNQ non-uniform codebooks, QTIP trellis, SpinQuant
- ``ops``       Pallas TPU kernels (LUT-GEMV, dequant, FWHT) + packing
- ``nn``        quantized linear pytrees
- ``models``    pure-pytree model stacks (Llama family and friends)
- ``parallel``  mesh/sharding rules for multi-chip execution
- ``formats``   packed checkpoint formats
- ``pipelines`` end-to-end quantization drivers (cache-keyed, layer-resumable)
- ``serve``     jitted prefill/decode engine
- ``evaluate``  perplexity / downstream-eval harness

The reference implementation this re-creates is snu-mllab/GuidedQuant
(CUDA/torch); see SURVEY.md at the repo root for the complete layer map.
"""

__version__ = "0.1.0"
