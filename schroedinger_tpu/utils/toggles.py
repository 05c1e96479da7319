"""Device-path debug toggles (bisection aid for hardware faults).

SCHRO_TPU_DISABLE is a comma-separated list of feature names whose
device-side formulation should fall back to the previous (round-3)
behaviour.  Used to bisect TPU-worker faults without checking out old
code; production runs leave it unset.

Known names:
  fused_intra   gop.py takes the unfused intra path
  lam_fit       no on-device per-frame lambda bisection (target_bits=0
                and the fit cond is compiled out)
  error_power   stat tables + multiquant use squared error, not
                |d|**magic_error_power
  flag_entropy  stat-table bit model = raw sint lengths (no zero-flag
                first-order entropy term)
  int8_wire     coefficient wire is full int16 (no lo/hi split)
  stage_split   2-ref picture runs as ONE jitted program (round-3
                structure) instead of me/mid/back stages
"""
import os

_DISABLED = frozenset(
    t.strip() for t in os.environ.get("SCHRO_TPU_DISABLE", "").split(",")
    if t.strip())

if _DISABLED:
    import sys
    print(f"schroedinger_tpu: DISABLED features: {sorted(_DISABLED)}",
          file=sys.stderr)


def disabled(name: str) -> bool:
    return name in _DISABLED
