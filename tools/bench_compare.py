"""Paired interleaved A/B bench: HEAD vs a reference checkout
(VERDICT r8 #3 — machine-hour-proof round-over-round claims).

r8's own data showed two clean-stamped runs of IDENTICAL code at
33.1 vs 38.7 s: hypervisor neighbors shrink parallel capacity across
machine-hours, so "r9 is X% faster than r8" from two artifacts
recorded hours apart carries ±15% ambient error. This tool removes the
machine-hour term by hosting BOTH trees simultaneously (each in its
own JVM via tools/bench_compare_worker.py, exercised strictly one at a
time) and timing each gate back-to-back A/B within seconds, with the
side order swapped every round (ABBA) so slow drift cancels inside
pairs too, and the worker PAIR recreated across blocks in alternating
creation order — per-JVM-instance luck was measured on this box as a
~15% creation-order fixed effect (same tree on both sides), which a
single long-lived pair would bake into every sample.

Per gate it reports min- and median-over-rounds for both sides, their
ratios, the per-round paired sign vector, and a two-sided binomial sign
test p-value — a gate is only claimed faster/slower when the SIGNS
agree, not because one side drew a quiet machine-hour (the medians are
the robust point estimate; a single noisy draw moves a min by its full
magnitude).

Usage:
  python bench.py --compare REF_SHA [--rounds N] [--blocks K] [--gates a,b,...]
  python tools/bench_compare.py REF_SHA ...      (equivalent)

REF_SHA may be any committish (a worktree is created under /tmp) or an
existing directory. Writes bench_compare.json and prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORKER = os.path.join(REPO, "tools", "bench_compare_worker.py")


class Side:
    def __init__(self, label: str, tree: str):
        self.label, self.tree = label, tree
        env = dict(os.environ)
        # The worker must resolve the package from ITS tree, not from a
        # PYTHONPATH this parent inherited pointing at HEAD.
        env["PYTHONPATH"] = tree
        self.proc = subprocess.Popen(
            [sys.executable, WORKER, tree, SF_DIR],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            env=env,
        )
        ready = json.loads(self._readline())
        assert ready.get("ready"), ready
        self.gates = set(ready["gates"])

    def _readline(self) -> str:
        line = self.proc.stdout.readline()
        if not line:
            raise RuntimeError(
                f"worker {self.label} ({self.tree}) died"
            )
        return line

    def run_gate(self, name: str) -> float:
        self.proc.stdin.write(name + "\n")
        self.proc.stdin.flush()
        out = json.loads(self._readline())
        if "err" in out:
            raise RuntimeError(f"{self.label}:{name}: {out['err']}")
        return out["s"]

    def close(self) -> None:
        try:
            self.proc.stdin.write("EXIT\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=30)
        except Exception:
            self.proc.kill()


def _resolve_ref_tree(ref: str) -> str:
    """A directory for the reference side: the ref itself if it's a
    directory, else a detached git worktree of the committish."""
    if os.path.isdir(ref):
        return os.path.abspath(ref)
    sha = subprocess.check_output(
        ["git", "rev-parse", ref], cwd=REPO, text=True
    ).strip()
    tree = f"/tmp/bench_cmp_{sha[:12]}"
    if not os.path.isdir(tree):
        subprocess.check_call(
            ["git", "worktree", "add", "--detach", tree, sha], cwd=REPO,
            stdout=subprocess.DEVNULL,
        )
    return tree


def _gate_source_hashes(tree: str) -> dict[str, str]:
    """name → md5(source) for every registered query function in one
    tree, computed in a throwaway subprocess (each tree must resolve
    its OWN package; no SparkSession is started — registry import
    only). Used to AUTO-INCLUDE changed gates in the A/B set (r12,
    VERDICT r11 item 5): a gate whose function changed since the ref
    SHA is exactly the gate whose raw-artifact delta needs paired
    adjudication, and the default headline set used to miss it."""
    code = (
        "import json,sys,inspect,hashlib\n"
        f"sys.path.insert(0, {tree!r})\n"
        "from tutorial_apache_beam_spark import registry\n"
        "print(json.dumps({n: hashlib.md5(inspect.getsource(f)"
        ".encode()).hexdigest() for n, f in registry.queries().items()}))\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    out = subprocess.check_output(
        [sys.executable, "-c", code], env=env, text=True,
        stderr=subprocess.DEVNULL,
    )
    return json.loads(out.strip().splitlines()[-1])


def _sign_test_p(wins: int, losses: int) -> float:
    """Two-sided exact binomial sign test over non-tied pairs."""
    n = wins + losses
    if n == 0:
        return 1.0
    k = min(wins, losses)
    tail = sum(math.comb(n, i) for i in range(k + 1)) / 2**n
    return round(min(1.0, 2 * tail), 4)


def compare(
    ref: str,
    rounds: int,
    gates: list[str] | None,
    blocks: int = 2,
    extra_gates: list[str] | None = None,
) -> dict:
    from bench import (  # HEAD's bench constants/probes
        HEADLINE,
        _cal_probe,
        _cpu_jiffies,
        _host_fingerprint,
        _steal_pct,
    )

    ref_tree = _resolve_ref_tree(ref)
    t_start = time.monotonic()
    # Auto-include gates whose registered function SOURCE differs
    # between the trees (r12): changed gates are the ones whose
    # raw-artifact movement needs paired adjudication most, and an
    # explicit --gates list is left exactly as given (the caller chose).
    auto_included: list[str] = []
    if gates is None:
        try:
            head_h = _gate_source_hashes(REPO)
            ref_h = _gate_source_hashes(ref_tree)
            auto_included = sorted(
                g
                for g in head_h.keys() & ref_h.keys()
                if head_h[g] != ref_h[g] and g not in HEADLINE
            )
        except Exception:
            auto_included = []  # hash pass is best-effort, never fatal
    jiffies0 = _cpu_jiffies()
    cal0 = round(_cal_probe(), 3)

    # Two nuisance effects must cancel, and they need different levers:
    # - run-order drift WITHIN a worker pair → ABBA per round;
    # - per-JVM-INSTANCE luck → measured on this box as a creation-order
    #   fixed effect: with BOTH sides pointing at the same tree, the
    #   first-created JVM ran the heavy gates ~15% faster (median ratio
    #   0.86 over 4 rounds), and in tree-vs-tree runs the bias flipped
    #   sides between sessions. A single long-lived pair bakes that luck
    #   into every sample, so rounds are split into `blocks` with the
    #   pair RECREATED per block in alternating creation order — the
    #   instance effect becomes a balanced random effect.
    names: list[str] = []
    missing: list[str] = []
    samples: dict[str, dict[str, list[float]]] = {}
    blocks = max(1, min(blocks, rounds))
    base = rounds // blocks
    block_rounds = [
        base + (1 if i < rounds % blocks else 0) for i in range(blocks)
    ]
    r_global = 0
    for bi, n_rounds in enumerate(block_rounds):
        if n_rounds == 0:
            continue
        specs = [("head", REPO), ("ref", ref_tree)]
        if bi % 2:
            specs.reverse()
        sides = {key: Side(key.upper(), tree) for key, tree in specs}
        a, b = sides["head"], sides["ref"]
        try:
            if not names:
                both = a.gates & b.gates
                if gates is not None:
                    names = list(gates)
                else:
                    names = [g for g in HEADLINE if g in both] + [
                        g for g in auto_included if g in both
                    ] + [
                        g
                        for g in (extra_gates or [])
                        if g in both
                        and g not in HEADLINE
                        and g not in auto_included
                    ]
                missing = [
                    g
                    for g in (
                        gates
                        or (
                            list(HEADLINE)
                            + auto_included
                            + (extra_gates or [])
                        )
                    )
                    if g not in both
                ]
                samples = {g: {"head": [], "ref": []} for g in names}
            # Warm both fresh JVMs outside the recorded rounds (codegen +
            # first-scan costs hit whichever side goes first otherwise),
            # in this block's creation order.
            for g in names:
                for key, _tree in specs:
                    sides[key].run_gate(g)
            for _ in range(n_rounds):
                order = [(a, "head"), (b, "ref")]
                if r_global % 2:  # ABBA: cancel monotone drift in pairs
                    order.reverse()
                r_global += 1
                for g in names:
                    for side, key in order:
                        samples[g][key].append(side.run_gate(g))
        finally:
            a.close()
            b.close()

    cal1 = round(_cal_probe(), 3)
    steal = _steal_pct(jiffies0)

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    per_gate = {}
    h_tot = r_tot = hm_tot = rm_tot = 0.0
    for g in names:
        h, r_ = samples[g]["head"], samples[g]["ref"]
        wins = sum(1 for x, y in zip(h, r_) if x < y)
        losses = sum(1 for x, y in zip(h, r_) if x > y)
        mh, mr = min(h), min(r_)
        h_tot += mh
        r_tot += mr
        hm, rm = _median(h), _median(r_)
        hm_tot += hm
        rm_tot += rm
        per_gate[g] = {
            "head": h,
            "ref": r_,
            "min_head": mh,
            "min_ref": mr,
            "ratio_min": round(mh / mr, 3) if mr else None,
            # Per-pair medians are the robust estimator here: a single
            # noisy draw moves a gate's MIN by its full magnitude
            # (observed ratio_min 1.61 on IDENTICAL trees for the
            # heaviest gate) but moves the median by at most one rank.
            "median_head": round(hm, 3),
            "median_ref": round(rm, 3),
            "ratio_median": round(hm / rm, 3) if rm else None,
            "head_faster_rounds": wins,
            "ref_faster_rounds": losses,
            "sign_p": _sign_test_p(wins, losses),
        }
    out = {
        "ref": ref,
        "ref_tree": ref_tree,
        "rounds": rounds,
        "blocks": blocks,
        "sf_dir": SF_DIR,
        "gates": per_gate,
        "missing_gates": missing,
        "auto_included_changed_gates": auto_included,
        "total_min_head": round(h_tot, 3),
        "total_min_ref": round(r_tot, 3),
        "total_ratio": round(h_tot / r_tot, 3) if r_tot else None,
        "total_median_head": round(hm_tot, 3),
        "total_median_ref": round(rm_tot, 3),
        "total_median_ratio": round(hm_tot / rm_tot, 3) if rm_tot else None,
        "wall_s": round(time.monotonic() - t_start, 1),
        "cal_samples": [cal0, cal1],
        "steal_pct": steal,
        "host": _host_fingerprint(),
    }
    return out


def main(argv: list[str]) -> None:
    if not argv or argv[0].startswith("-"):
        raise SystemExit(__doc__)
    ref = argv[0]
    rounds = 6
    blocks = 2
    gates = None
    extra_gates = None
    it = iter(argv[1:])
    for tok in it:
        if tok == "--rounds":
            rounds = int(next(it))
        elif tok == "--blocks":
            blocks = int(next(it))
        elif tok == "--gates":
            gates = next(it).split(",")
        elif tok == "--extra-gates":
            # Appended to the DEFAULT set (headline + auto-included
            # changed gates) without suppressing the auto-include pass —
            # for A/B-checking gates whose OPERATOR internals changed
            # (the function-source hash can't see through the call).
            extra_gates = next(it).split(",")
        else:
            raise SystemExit(f"unknown arg {tok!r}\n{__doc__}")
    out = compare(ref, rounds, gates, blocks=blocks, extra_gates=extra_gates)
    with open(os.path.join(REPO, "bench_compare.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    for g, e in out["gates"].items():
        verdict = (
            "head faster" if e["sign_p"] < 0.1
            and e["head_faster_rounds"] > e["ref_faster_rounds"]
            else "ref faster" if e["sign_p"] < 0.1
            else "no significant difference"
        )
        print(
            f"{g:35s} med {e['median_head']:7.3f}/{e['median_ref']:7.3f}"
            f" r={e['ratio_median']:5.3f}  min r={e['ratio_min']:5.3f}"
            f"  signs +{e['head_faster_rounds']}"
            f"/-{e['ref_faster_rounds']}  p={e['sign_p']:6.4f}  {verdict}"
        )
    print(json.dumps({
        "metric": "bench_compare_total_median_ratio",
        "value": out["total_median_ratio"],
        "unit": "head/ref",
        "total_min_ratio": out["total_ratio"],
        "total_median_head": out["total_median_head"],
        "total_median_ref": out["total_median_ref"],
        "steal_pct": out["steal_pct"],
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
