"""CTC loss implementations, replacing the reference's warp-ctc C++/CUDA
extension (SURVEY.md section 2.2: Baidu warp-ctc + PyTorch binding).

Three interchangeable implementations, all fixed-shape / jit-safe:

* ``ctc_ref.ctc_loss_ref`` — alpha-only log-space forward via ``lax.scan``;
  gradient by JAX autodiff through the scan. Slowest; the numeric ground
  truth (validated against torch.nn.CTCLoss and optax.ctc_loss).
* ``ctc_fb.ctc_loss`` — alpha-beta forward-backward with an analytic
  ``custom_vjp`` (gradient = -posterior, scattered to classes by matmul).
* ``ctc_pallas.ctc_loss_pallas`` — Pallas TPU kernel for the hot path.

Conventions (matching warp-ctc / torch.nn.CTCLoss as used by the reference):
blank id = 0; inputs are per-frame log-probabilities (B, T, C); returns
per-utterance negative log-likelihood (no length normalization).
"""

from tpuasr.losses.align import ctc_align
from tpuasr.losses.ctc_fb import ctc_loss
from tpuasr.losses.ctc_ref import ctc_loss_ref


def get_ctc_loss(impl: str = "fb"):
    """impl: 'ref' (autodiff scan) | 'fb' (analytic vjp) | 'pallas' (TPU
    kernel forward-backward) | 'auto' (pallas on TPU — measured 2.5/4.0 ms
    fwd/fwd+bwd vs fb's 4.6/3.6 at B=128,T=250 — fb elsewhere, where the
    interpreter would crawl)."""
    if impl == "auto":
        import jax
        impl = "pallas" if jax.default_backend() == "tpu" else "fb"
    if impl == "ref":
        return ctc_loss_ref
    if impl == "fb":
        return ctc_loss
    if impl == "pallas":
        from tpuasr.losses.ctc_pallas import ctc_loss_pallas
        return ctc_loss_pallas
    raise ValueError(f"unknown CTC impl {impl!r}")


__all__ = ["ctc_align", "ctc_loss", "ctc_loss_ref", "get_ctc_loss"]
