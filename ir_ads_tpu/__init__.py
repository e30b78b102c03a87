"""ir_ads_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of yunduo-vision/IR-ADS.

Three stacks, mirroring the reference's capability surface (see SURVEY.md):

1. Multimodal semantic segmentation (``ir_ads_tpu.models`` /
   ``ir_ads_tpu.training`` / ``ir_ads_tpu.evaluation``): dual-stream Swin-B/L
   backbone with MAPA adapters, MPG cross-modal prompting and DSCF deformable
   fusion, decoded by SegFormer heads.
2. Open-set instance detection (``ir_ads_tpu.detection``): deformable-DETR /
   DINO family with multi-scale deformable attention.
3. Anomaly separation (``ir_ads_tpu.anomaly``): Light Schrödinger Bridge +
   deviation loss.

Everything is NHWC, bf16-friendly, static-shape and jit/pjit compilable;
parallelism is expressed through a single ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
