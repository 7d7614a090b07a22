"""tokenflow-tpu: a TPU-native (JAX/Flax/Pallas/pjit) video-editing framework.

Provides the capabilities of omerbt/TokenFlow (training-free, text-driven
video editing with a pre-trained Stable Diffusion model) as an idiomatic
TPU-first design: a Flax SD UNet/VAE/CLIP inference stack, jit-scanned DDIM
inversion with an in-memory latent trajectory, a hook-free functional editing
runtime (keyframe extended attention + nearest-neighbor token propagation),
Pallas kernels for the hot paths, and frame-axis sharding over a device mesh.
"""

__version__ = "0.1.0"

__all__ = [
    "api",
    "runtime",
    "utils",
    "profiling",
]
