"""A/B the M-step budget cap (config.MSTEP_MAXFUN_CAP) against the
reference budget (maxfun = max(30, 20+5D), kernel_class.py:542) across the
gated parity configs (VERDICT r2 item 4).

Runs each requested config twice through tools/parity.py --run (once with
the default cap, once with DGP_TPU_MSTEP_CAP=none) and records both results
plus the reference anchor into MSTEP_CAP_COMPARE.json.

Usage: python tools/mstep_cap_compare.py [config ...]
"""
import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
OUT = os.path.join(_ROOT, "MSTEP_CAP_COMPARE.json")
PARITY = os.path.join(_HERE, "parity.py")

sys.path.insert(0, _HERE)
from parity import CONFIGS, DTYPES, PLATFORMS  # noqa: E402

T0 = time.time()


def _log(msg):
    print(f"[cap_ab +{time.time()-T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def run_one(name, cap):
    env = dict(os.environ)
    if PLATFORMS.get(name, "cpu") == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    else:
        env.pop("JAX_PLATFORMS", None)
    if cap is None:
        env["DGP_TPU_MSTEP_CAP"] = "none"
    else:
        env.pop("DGP_TPU_MSTEP_CAP", None)
    try:
        proc = subprocess.run([sys.executable, PARITY, "--run", name],
                              env=env, capture_output=True, text=True,
                              timeout=5400)
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    for line in proc.stdout.splitlines():
        if line.startswith("PARITY_RESULT "):
            return json.loads(line[len("PARITY_RESULT "):])
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
    return {"error": (tail[-1] if tail else f"rc={proc.returncode}")[:300]}


def main():
    names = sys.argv[1:] or ["motorcycle", "dgp_poisson", "negbin", "linked",
                             "vecchia"]
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)
    anchors = {}
    apath = os.path.join(_ROOT, "REF_ANCHORS.json")
    if os.path.exists(apath):
        with open(apath) as fh:
            anchors = json.load(fh)
    for name in names:
        row = results.get(name, {})
        for label, cap in (("cap_default", 16), ("cap_none", None)):
            _log(f"{name} {label}")
            row[label] = run_one(name, cap)
            _log(f"{name} {label}: {row[label]}")
            ref = anchors.get(name)
            if ref:
                row["reference"] = {k: v for k, v in ref.items()
                                    if k not in ("wall_s", "source")}
            results[name] = row
            with open(OUT, "w") as fh:
                json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
