"""Parse the hardware-queue log and recommend production adoptions.

The round-3 verdict's adoption checklist (docs/ROUND3.md, VERDICT items
2/4/5) turns sweep logs into table edits by hand. This tool automates the
reading half so the hardware window — which may open minutes before the
round ends — spends its time measuring, not grepping:

    python tools/adopt.py [/tmp/hw_queue.log ...]

It understands the output of every queued tool (tools/exp_pack.py,
tools/tpu_check.py, tools/longpair_check.py, bench.py) and prints, per
decision in the checklist, the measured evidence and a concrete
recommendation (the exact ``_SHAPES_*`` tuple to prepend, the
``PRODUCTION_UPK`` flip verdict, the mq adopt-or-DELETE call, the
roofline refresh). Decision rules encode the verdict's discipline:

- a config is adoptable only with >=3 timing repetitions (run-to-run
  spread is ~±6%, docs/DESIGN.md) and ``exact=True``;
- a challenger must beat the incumbent by more than the larger of the
  two measured spreads (floor 6%) — inside that band it's a tie and the
  incumbent stays;
- any ``exact=False`` anywhere in the log is CRITICAL and blocks every
  recommendation the affected band could make.

This is a recommender, not an auto-editor: the human (or the session)
applies the printed edits and re-runs `exp_pack --only-production` to
confirm. Pure stdlib + no jax import — safe to run anywhere, any time.
"""

from __future__ import annotations

import json
import math
import re
import sys
from dataclasses import dataclass, field

# --- line grammars (must track the tools' print formats) -----------------

RE_STEP = re.compile(r"^--- \[(\w+)\] (.+?) ---$")
RE_RC = re.compile(r"^rc=(\d+)$")
RE_BAND = re.compile(
    r"^--- (?:mq(\d+) )?lq=(\d+) \(production: (.+?)\) ---$"
)
RE_CFG = re.compile(
    r"KernelConfig\(nw=(\d+), jb=(\d+), ui=(\d+), ic=(\d+)"
    r"(?:, pipe=(\d+))?(?:, pack=(\d+))?(?:, upk='(\w+)')?\)"
)
RE_RESULT = re.compile(
    r"^(?:mq\d+ )?lq=\s*(\d+) (KernelConfig\(.*?\)): "
    r"exact=(\w+)\s+(-?[\d.]+) GCUPS(?:\s+\(load \d+s\))?( rep\d+)?$"
)
RE_MEDIAN = re.compile(
    r"^lq=\s*(\d+) (KernelConfig\(.*?\)): median\s+(-?[\d.]+) GCUPS "
    r"over (\d+) reps \(spread ([\d.]+)%\)$"
)
RE_FAIL = re.compile(r"(COMPILE FAIL|TIMING FAIL|SKIP \(exceeds VMEM)")
RE_FAILURES = re.compile(r"^FAILURES: (\d+)$")
RE_MQ64 = re.compile(
    r"^mq64: exact=(\w+).*kernel speedup=([\d.]+)x.*"
    r"aggregate=([\d.]+) GCUPS$"
)
RE_LONGPAIR = re.compile(
    r"^longpair lq=(\d+):\s+(-?[\d.]+) GCUPS wall \((.+)\)$"
)
RE_STRIPED_VERIFY = re.compile(r"^striped verify lq=(\d+): exact=(\w+)$")
RE_AB_VARIANT = re.compile(
    r"^v\d+ KernelConfig.*median\s+([\d.]+) GCUPS(?: wall)? "
    r"\(spread ([\d.]+)%"
)
RE_AB_WINNER = re.compile(
    r"^WINNER v(\d+): (KernelConfig\(.*?\))(?: sr=(\d+))?\s+"
    r"([\d.]+) GCUPS \(([\d.]+)x vs v0\)$"
)
RE_EXACT_ANY = re.compile(r"exact=(True|False)")

SPREAD_FLOOR = 6.0  # % — docs/DESIGN.md measured run-to-run spread
MIN_REPS = 3  # VERDICT round-3 item 2: adoption needs >=3 repetitions


def parse_cfg(text: str) -> dict | None:
    m = RE_CFG.search(text)
    if not m:
        return None
    nw, jb, ui, ic = (int(g) for g in m.groups()[:4])
    return dict(nw=nw, jb=jb, ui=ui, ic=ic,
                pipe=int(m.group(5) or 0), pack=int(m.group(6) or 1),
                upk=m.group(7) or "floor")


def shape_tuple(cfg: dict, lq: int, nq: int = 1) -> tuple:
    """Map a winning KernelConfig back to a ``_SHAPES_*`` table entry.

    Table entries are (nw, jb, ui, pipe, full_ic[, pack]); full_ic means
    choose_config should size the chunk to the whole padded query (the
    lattice padding mirrors _vmem_ic_budget).
    """
    lat = cfg["ui"] * cfg["pack"] // math.gcd(cfg["ui"], cfg["pack"])
    lqp = nq * (-(-lq // lat) * lat)
    full_ic = cfg["ic"] >= lqp
    base = (cfg["nw"], cfg["jb"], cfg["ui"], cfg["pipe"], full_ic)
    return base + ((cfg["pack"],) if cfg["pack"] > 1 else ())


def table_for(lq: int, nq: int = 1) -> str:
    if nq > 1:
        return "_SHAPES_MQ"
    if lq <= 48:
        return "_SHAPES_SHORT"
    if lq < 96:
        return "_SHAPES_LONG"
    if lq < 256:
        return "_SHAPES_XLONG"
    return "_SHAPES_XXLONG"


@dataclass
class Entry:
    cfg_text: str
    cfg: dict
    reps: list[float] = field(default_factory=list)
    median: float | None = None
    n_reps: int = 0
    spread: float | None = None
    exact: str = "skipped"  # True / False / skipped

    @property
    def score(self) -> float | None:
        if self.median is not None:
            return self.median
        if self.reps:
            s = sorted(self.reps)
            return s[len(s) // 2]
        return None

    @property
    def eff_reps(self) -> int:
        return self.n_reps or len(self.reps)

    @property
    def eff_spread(self) -> float:
        if self.spread is not None:
            return max(self.spread, SPREAD_FLOOR)
        if len(self.reps) > 1 and min(self.reps) > 0:
            s = sorted(self.reps)
            med = s[len(s) // 2]
            return max((max(s) - min(s)) / med * 100, SPREAD_FLOOR)
        return SPREAD_FLOOR


@dataclass
class Band:
    lq: int
    nq: int
    upk_round: bool
    const_s: bool
    production: str  # cfg repr from the band header, or "None"
    entries: dict[str, Entry] = field(default_factory=dict)

    def entry(self, cfg_text: str, cfg: dict) -> Entry:
        e = self.entries.get(cfg_text)
        if e is None:
            e = self.entries[cfg_text] = Entry(cfg_text, cfg)
        return e


class LogModel:
    def __init__(self):
        self.bands: dict[tuple, Band] = {}
        self.bench_lines: list[dict] = []
        self.longpair: list[tuple[str, int, float, str]] = []
        self.mq64: tuple | None = None
        self.striped_verify: list[tuple[int, str]] = []
        # interleaved A/B winner lines (longpair_check --ab / ab_check):
        # (step_desc, cfg_text, stripe_rows|None, gcups, ratio_vs_v0,
        #  max measured spread % among the step's variants)
        self.ab_winners: list[
            tuple[str, str, int | None, float, float, float]] = []
        self.critical: list[str] = []
        self.fails: list[str] = []
        self.steps: list[tuple[str, str, int | None]] = []
        self.tpu_check_failures: list[int] = []

    def band(self, lq, nq, upk_round, const_s, production) -> Band:
        key = (lq, nq, upk_round, const_s)
        b = self.bands.get(key)
        if b is None:
            b = self.bands[key] = Band(lq, nq, upk_round, const_s,
                                       production)
        elif production != "None":
            b.production = production
        return b


def parse(paths: list[str]) -> LogModel:
    m = LogModel()
    step_id, step_desc = "-", "(no step header)"
    ab_step_spread = 0.0  # max measured spread among the current
    # step's interleaved A/B variants (reset at each WINNER line)
    upk_round = const_s = False
    cur_band: Band | None = None

    for path in paths:
        try:
            fh = open(path, errors="replace")
        except OSError as ex:
            print(f"note: {ex}", file=sys.stderr)
            continue
        with fh:
            for raw in fh:
                line = raw.rstrip("\n")

                s = RE_STEP.match(line)
                if s:
                    step_id, step_desc = s.group(1), s.group(2)
                    d = step_desc.lower()
                    upk_round = "upk=round" in d or "--upk round" in d
                    const_s = "const" in d and "-s" in d or \
                        "constant-s" in d
                    cur_band = None
                    m.steps.append((step_id, step_desc, None))
                    continue
                rc = RE_RC.match(line)
                if rc and m.steps:
                    sid, sdesc, _ = m.steps[-1]
                    m.steps[-1] = (sid, sdesc, int(rc.group(1)))
                    continue

                b = RE_BAND.match(line)
                if b:
                    nq = int(b.group(1)) if b.group(1) else 1
                    cur_band = m.band(int(b.group(2)), nq, upk_round,
                                      const_s, b.group(3))
                    continue

                med = RE_MEDIAN.match(line)
                if med:
                    lq, cfg_text = int(med.group(1)), med.group(2)
                    cfg = parse_cfg(cfg_text)
                    band = cur_band if cur_band and cur_band.lq == lq \
                        else m.band(lq, 1, upk_round, const_s, "None")
                    if cfg:
                        e = band.entry(cfg_text, cfg)
                        e.median = float(med.group(3))
                        e.n_reps = int(med.group(4))
                        e.spread = float(med.group(5))
                    continue

                r = RE_RESULT.match(line)
                if r:
                    lq, cfg_text = int(r.group(1)), r.group(2)
                    cfg = parse_cfg(cfg_text)
                    band = cur_band if cur_band and cur_band.lq == lq \
                        else m.band(lq, 1, upk_round, const_s, "None")
                    if cfg:
                        e = band.entry(cfg_text, cfg)
                        e.reps.append(float(r.group(4)))
                        if r.group(3) in ("True", "False"):
                            e.exact = r.group(3)
                    if r.group(3) == "False":
                        m.critical.append(f"[{step_id}] {line}")
                    continue

                lp = RE_LONGPAIR.match(line)
                if lp:
                    m.longpair.append((step_desc, int(lp.group(1)),
                                       float(lp.group(2)), lp.group(3)))
                    continue
                av = RE_AB_VARIANT.match(line)
                if av:
                    ab_step_spread = max(ab_step_spread,
                                         float(av.group(2)))
                    continue
                ab = RE_AB_WINNER.match(line)
                if ab:
                    m.ab_winners.append((
                        step_desc, ab.group(2),
                        int(ab.group(3)) if ab.group(3) else None,
                        float(ab.group(4)), float(ab.group(5)),
                        ab_step_spread,
                    ))
                    ab_step_spread = 0.0
                    continue
                sv = RE_STRIPED_VERIFY.match(line)
                if sv:
                    m.striped_verify.append((int(sv.group(1)),
                                             sv.group(2)))
                    if sv.group(2) == "False":
                        m.critical.append(f"[{step_id}] {line}")
                    continue
                q = RE_MQ64.match(line)
                if q:
                    m.mq64 = (q.group(1), float(q.group(2)),
                              float(q.group(3)))
                    if q.group(1) == "False":
                        m.critical.append(f"[{step_id}] {line}")
                    continue
                f = RE_FAILURES.match(line)
                if f:
                    m.tpu_check_failures.append(int(f.group(1)))
                    if int(f.group(1)):
                        m.critical.append(f"[{step_id}] {line}")
                    continue
                if line.startswith('{"metric"'):
                    try:
                        m.bench_lines.append(json.loads(line))
                    except ValueError:
                        pass
                    continue
                if RE_FAIL.search(line):
                    m.fails.append(f"[{step_id}] {line}")
                    continue
                # catch exactness failures in formats not matched above
                # (check_paths etc.)
                if "exact=False" in line:
                    m.critical.append(f"[{step_id}] {line}")
    return m


def _score_line(e: Entry, mark: str) -> str:
    extra = (f" (median of {e.eff_reps} reps, spread "
             f"{e.eff_spread:.1f}%)" if e.eff_reps > 1 else
             " (SINGLE REP)")
    return (f"  {mark} {e.score:7.1f} GCUPS  exact={e.exact}  "
            f"{e.cfg_text}{extra}")


def report(m: LogModel) -> int:
    out = []
    rc = 0
    # Concrete one-line table edits backing every ADOPT above threshold —
    # printed as a READY EDITS block at the end so a queue run can never
    # strand a measured adoption in prose (VERDICT round-4 item 6).
    edits: list[str] = []

    if m.critical:
        rc = 1
        out.append("== CRITICAL — exactness/validation failures ==")
        out += [f"  {c}" for c in m.critical]
        out.append("  NO adoption below may proceed for affected paths "
                   "until these are explained.")
        out.append("")

    if m.bench_lines:
        out.append("== bench.py lines ==")
        for bl in m.bench_lines:
            tag = " [rehearsal]" if (bl.get("detail") or {}).get(
                "rehearsal") else ""
            out.append(f"  {bl.get('metric')}={bl.get('value')} "
                       f"{bl.get('unit')} vs_baseline="
                       f"{bl.get('vs_baseline')}{tag}")
        out.append("")

    # --- const-S ceilings ---
    ceilings = {}
    for (lq, nq, upkr, cs), band in sorted(m.bands.items()):
        if cs and nq == 1:
            scores = [e.score for e in band.entries.values()
                      if e.score is not None]
            if scores:
                ceilings[lq] = max(scores)
    if ceilings:
        out.append("== const-S ceilings (roofline refresh) ==")
        for lq, g in ceilings.items():
            out.append(f"  lq={lq}: {g:.1f} GCUPS")
        peak = max(ceilings.values())
        out.append(f"  -> set bench.py ROOFLINE_GCUPS = {peak:.1f} and "
                   "record the per-band table in docs/DESIGN.md")
        out.append("")

    # --- flat bands (floor upk, not const-S) ---
    flat_best: dict[int, float] = {}
    hdr_done = False
    for (lq, nq, upkr, cs), band in sorted(m.bands.items()):
        if nq != 1 or cs or upkr:
            continue
        entries = [e for e in band.entries.values()
                   if e.score is not None]
        if not entries:
            continue
        if not hdr_done:
            out.append("== flat bands (per-band pack/chain sweep) ==")
            hdr_done = True
        entries.sort(key=lambda e: -e.score)
        prod_cfg = parse_cfg(band.production)
        prod_e = None
        if prod_cfg:
            for e in entries:
                if e.cfg == prod_cfg:
                    prod_e = e
                    break
        out.append(f"-- lq={lq} (production: {band.production}) --")
        for e in entries[:6]:
            mark = "*" if e is prod_e else " "
            out.append(_score_line(e, mark))
        winner = next((e for e in entries if e.exact != "False"), None)
        if winner:
            flat_best[lq] = winner.score
        if winner is None or prod_e is None:
            if winner is not None and prod_e is None:
                out.append(
                    "  ?? production config not measured in this log — "
                    "run exp_pack --only-production before deciding")
            out.append("")
            continue
        margin = max(winner.eff_spread, prod_e.eff_spread)
        if winner is prod_e or winner.cfg == prod_e.cfg:
            out.append("  => KEEP production (it is the measured winner)")
        elif winner.score <= prod_e.score * (1 + margin / 100):
            out.append(
                f"  => KEEP production — winner +"
                f"{(winner.score / prod_e.score - 1) * 100:.1f}% is "
                f"inside the {margin:.1f}% spread band (tie)")
        elif winner.eff_reps < MIN_REPS:
            out.append(
                f"  => NEEDS REPEATS — {winner.cfg_text} beats "
                f"production by "
                f"{(winner.score / prod_e.score - 1) * 100:.1f}% but has "
                f"{winner.eff_reps} rep(s) < {MIN_REPS}; rerun "
                f"exp_pack --lq {lq} --repeat 3 before adopting")
        elif winner.exact == "skipped":
            out.append(
                f"  => VERIFY FIRST — winner {winner.cfg_text} was "
                "timed with verification skipped; rerun without "
                "--skip-verify/--const-s before adopting")
        else:
            tup = shape_tuple(winner.cfg, lq)
            out.append(
                f"  => ADOPT: prepend {tup} to {table_for(lq)} "
                f"(ops/swa_pallas.py) — +"
                f"{(winner.score / prod_e.score - 1) * 100:.1f}% over "
                f"production, {winner.eff_reps} reps, margin "
                f"{margin:.1f}%")
            edits.append(f"{table_for(lq)}: prepend {tup},  # lq={lq} "
                         f"{winner.score:.1f} GCUPS, "
                         f"{winner.eff_reps} reps")
            if winner.cfg["upk"] != "floor":
                out.append("     (winner ran upk="
                           f"{winner.cfg['upk']!r}: flip PRODUCTION_UPK "
                           "or carry upk in the table entry)")
        out.append("")

    # --- upk=round A/B ---
    rows = []
    for (lq, nq, upkr, cs), band in sorted(m.bands.items()):
        if not upkr or cs or nq != 1:
            continue
        for e in band.entries.values():
            if e.score is None:
                continue
            floor_band = m.bands.get((lq, 1, False, False))
            floor_e = None
            if floor_band:
                for fe in floor_band.entries.values():
                    if fe.score is not None and all(
                            fe.cfg[k] == e.cfg[k]
                            for k in ("nw", "jb", "ui", "pipe", "pack")):
                        floor_e = fe
                        break
            rows.append((lq, e, floor_e))
    if rows:
        out.append("== upk=round vs floor (PRODUCTION_UPK decision) ==")
        flips = 0
        for lq, e, fe in rows:
            if fe is None or fe.score is None:
                out.append(f"  lq={lq} {e.cfg_text}: round "
                           f"{e.score:.1f} GCUPS — no floor counterpart "
                           "in log")
                continue
            d = (e.score / fe.score - 1) * 100
            margin = max(e.eff_spread, fe.eff_spread)
            verdict = ("FLIP" if d > margin else
                       "tie" if abs(d) <= margin else "keep floor")
            flips += verdict == "FLIP"
            out.append(f"  lq={lq} {e.cfg_text}: round {e.score:.1f} vs "
                       f"floor {fe.score:.1f} GCUPS ({d:+.1f}%, margin "
                       f"{margin:.1f}%) -> {verdict}")
        out.append(
            "  => " + ("set PRODUCTION_UPK = 'round' (re-run tpu_check "
                       "--paths after)" if flips else
                       "record the negative in docs/DESIGN.md and keep "
                       "PRODUCTION_UPK = 'floor'"))
        out.append("")

    # --- mq row stacking: adopt or DELETE (VERDICT item 4) ---
    mq_bands = [(lq, band) for (lq, nq, upkr, cs), band
                in sorted(m.bands.items()) if nq > 1 and not cs]
    if mq_bands or m.mq64:
        out.append("== mq row stacking (adopt or DELETE) ==")
        any_win = False
        for lq, band in mq_bands:
            entries = [e for e in band.entries.values()
                       if e.score is not None and e.exact != "False"]
            if not entries:
                continue
            best = max(entries, key=lambda e: e.score)
            flat = flat_best.get(lq)
            if flat:
                d = (best.score / flat - 1) * 100
                win = d > max(best.eff_spread, SPREAD_FLOOR)
                any_win |= win
                out.append(
                    f"  lq={lq} (nq={band.nq}): stacked best "
                    f"{best.score:.1f} vs flat best {flat:.1f} GCUPS "
                    f"({d:+.1f}%) {best.cfg_text}"
                    + (f" -> ADOPT {shape_tuple(best.cfg, lq, band.nq)}"
                       f" into _SHAPES_MQ" if win else ""))
                if win:
                    edits.append(
                        f"_SHAPES_MQ: prepend "
                        f"{shape_tuple(best.cfg, lq, band.nq)},  # "
                        f"nq={band.nq} lq={lq} {best.score:.1f} GCUPS")
            else:
                out.append(f"  lq={lq} (nq={band.nq}): stacked best "
                           f"{best.score:.1f} GCUPS {best.cfg_text} — "
                           "no flat band at this lq in log; compare by "
                           "hand")
        if m.mq64:
            ex, spd, agg = m.mq64
            out.append(f"  mq64 aggregate: exact={ex}, kernel speedup "
                       f"{spd:.2f}x, {agg:.1f} GCUPS")
        if mq_bands:
            out.append(
                "  => " + ("stacking WINS its band: keep _SHAPES_MQ and "
                           "adopt the tuples above" if any_win else
                           "blocks-of-one wins again: DELETE _SHAPES_MQ,"
                           " the predicated chain-reset path and their "
                           "tests (third deferral forbidden — VERDICT "
                           "item 4)"))
        out.append("")

    # --- striped / longpair ---
    if m.longpair or m.striped_verify:
        out.append("== striped passes / longpair ==")
        for lq, ex in m.striped_verify:
            out.append(f"  striped verify lq={lq}: exact={ex}")
        base = None
        for desc, lq, g, detail in m.longpair:
            d = desc.lower()
            packed = "pack" in d and "pipe" in d
            out.append(f"  [{desc[:58]}] lq={lq}: {g:.1f} GCUPS "
                       f"({detail})")
            if not packed and base is None:
                base = (lq, g)
        packed_pts = [(desc, lq, g) for desc, lq, g in
                      ((d, l, v) for d, l, v, _ in m.longpair)
                      if "pack" in desc.lower() and "pipe" in
                      desc.lower()]
        if base and packed_pts:
            blq, bg = base
            best = max(packed_pts, key=lambda t: t[2])
            d = (best[2] / bg - 1) * 100
            if d > SPREAD_FLOOR:
                out.append(
                    f"  => packed stripes win ({d:+.1f}% over pipe0 "
                    "baseline): prepend the winning shape to "
                    "_SHAPES_STRIPE (pipe/pack/stripe_rows are in the "
                    "step description above) and re-run longpair_check "
                    "with no flags to confirm the table picks it up")
            else:
                out.append(
                    f"  => packed stripes do NOT clear the spread band "
                    f"({d:+.1f}%): keep _SHAPES_STRIPE as the XXLONG "
                    "fallback and record the negative in docs/DESIGN.md")
        out.append("  GCUPS points above go into docs/DESIGN.md "
                   "(VERDICT item 5 requires a measured long-pair "
                   "point).")
        out.append("")

    # --- interleaved A/B winners (longpair_check --ab / ab_check) ---
    if m.ab_winners:
        out.append("== interleaved A/B winners ==")
        for desc, cfg_text, sr, g, ratio, spread in m.ab_winners:
            out.append(f"  [{desc[:58]}] {cfg_text}"
                       + (f" sr={sr}" if sr else "")
                       + f": {g:.1f} GCUPS, {ratio:.3f}x vs v0"
                       + (f" (step spread {spread:.1f}%)" if spread
                          else ""))
            cfg = parse_cfg(cfg_text)
            # Gate the win on the step's own MEASURED spread (the
            # round-5 high-work interleaved method reaches 0.5-2.5%,
            # making 3-5% wins decidable) with a 1.5% honesty floor;
            # steps with no parsed variant spreads fall back to the
            # legacy 6% band.
            gate = max(spread, 1.5) if spread else SPREAD_FLOOR
            if cfg is None or ratio <= 1 + gate / 100:
                continue
            if sr:  # striped A/B: the table entry keys on stripe rows
                lat = cfg["ui"] * cfg["pack"] // math.gcd(
                    cfg["ui"], cfg["pack"])
                full_ic = cfg["ic"] >= -(-sr // lat) * lat
                tup = (cfg["nw"], cfg["jb"], cfg["ui"], cfg["pipe"],
                       full_ic) + (
                    (cfg["pack"],) if cfg["pack"] > 1 else ())
                edits.append(f"_SHAPES_STRIPE: prepend {tup},  # sr={sr}"
                             f" {g:.1f} GCUPS, {ratio:.3f}x vs v0")
            else:
                out.append("    (flat A/B: pair with its band's lq to "
                           "place the edit — see the band section)")
        out.append("")

    if m.fails:
        out.append("== compile/timing failures and VMEM skips ==")
        out += [f"  {f}" for f in m.fails]
        out.append("")

    if m.steps:
        out.append("== queue step exit codes ==")
        for sid, desc, code in m.steps:
            mark = "ok" if code == 0 else f"rc={code}"
            out.append(f"  [{sid}] {mark}  {desc[:70]}")
        out.append("")

    # --- READY EDITS: the adoption can never strand in prose ---
    if not out and not edits:
        print("nothing recognized in the log")
        return rc
    out.append("== READY EDITS (seqalign_tpu/ops/swa_pallas.py) ==")
    if m.critical:
        out.append("  BLOCKED by the CRITICAL failures above — resolve "
                    "first.")
    if edits:
        out += [f"  {e}" for e in edits]
        out.append("  apply, then re-verify on hardware: "
                   "tools/tpu_check.py --paths (+ longpair_check for "
                   "stripe edits)")
    else:
        out.append("  (none — every measured winner is already the "
                   "production selection or inside the spread band)")

    print("\n".join(out))
    return rc


def main() -> int:
    paths = sys.argv[1:] or ["/tmp/hw_queue.log"]
    return report(parse(paths))


if __name__ == "__main__":
    sys.exit(main())
