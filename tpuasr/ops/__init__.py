"""Pallas TPU kernels for hot ops (the rebuild's device-native layer,
complementing tpuasr/losses/ctc_pallas.py and features/pallas_fused.py)."""

from tpuasr.ops.pallas_gru import (gru_scan, gru_scan_bidir,
                                   gru_scan_xfused, gru_scan_xfused_q8)
from tpuasr.ops.quant import dequantize_per_channel, quantize_per_channel

__all__ = ["gru_scan", "gru_scan_bidir", "gru_scan_xfused",
           "gru_scan_xfused_q8", "quantize_per_channel",
           "dequantize_per_channel"]
