"""Regenerate REGISTRY_AUDIT.md from seaice_tpu.namelist's option table."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
from seaice_tpu.namelist import audit_rows, audit_summary

s = audit_summary()
DISP = {"supported": "supported", "na": "by-design N/A",
        "unsupported": "unsupported"}
lines = ["""# Registry option audit

Machine-checkable mapping of every reference namelist option
(`/root/reference/src/Registry.xml`, 316 options in 25 nml_records)
to its disposition in `seaice_tpu`. Source of truth:
`seaice_tpu/namelist.py` `REGISTRY`; cross-checked option-by-option
against the reference XML by `tests/test_namelist.py`.

Dispositions:
- **supported** — maps onto a `Config` / `RunSetup` / `ZbgcParams`
  field (shown), with value conversion where the reference uses
  selector strings. Unsupported *values* of supported options hard-error.
- **by-design N/A** — configures MPI/PIO/pool/stream infrastructure
  subsumed by the JAX architecture; accepted and ignored.
- **unsupported** — capability not implemented; accepted only at the
  Registry default, hard error otherwise.
""",
f"**Summary: {s['supported']} supported, {s['na']} by-design N/A,",
f"{s['unsupported']} unsupported, of {s['total']} total.**",
"", "| Record | Option | Disposition | Target / reason |", "|---|---|---|---|"]
for rec, name, disp, detail, _dv in audit_rows():
    lines.append(f"| {rec} | `{name}` | {DISP[disp]} | {detail} |")
open(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "REGISTRY_AUDIT.md"), "w").write(
    "\n".join(lines) + "\n")
print("summary:", s)
