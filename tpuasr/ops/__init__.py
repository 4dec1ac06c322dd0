"""Pallas TPU kernels for hot ops (the rebuild's device-native layer,
complementing tpuasr/losses/ctc_pallas.py and features/pallas_fused.py)."""

from tpuasr.ops.pallas_gru import gru_scan, gru_scan_bidir

__all__ = ["gru_scan", "gru_scan_bidir"]
