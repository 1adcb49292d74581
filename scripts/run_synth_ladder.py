"""End-to-end accuracy ladder on the synthetic 3DMatch-style corpus.

Real 3DMatch blobs are stripped from this mirror, so accuracy is proven
on the in-repo corpus (``yoho_tpu/data/synthetic.py``): generate ->
train FCGF from scratch -> generate the PartI/PartII trainset -> train
PartI -> train PartII -> evaluate YOHO-C and YOHO-O through the full
Redwood RR protocol on held-out test scenes, against an untrained
baseline. Mirrors the reference ladder (``others/Readme.md`` FCGF
training -> ``YOHO_Trainset.py`` -> ``Train.py`` -> ``Test.py``).

Every stage is idempotent (on-disk caching); rerunning resumes.

Usage: PYTHONPATH=/root/repo python scripts/run_synth_ladder.py \
         [--fcgf-seconds 600] [--stage all]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VAL = "scene_05"  # last synth_train scene held out for PartI/II validation


STAGE_TIMEOUT = 0.0  # seconds; 0 = none (set by --stage-timeout)


def fingerprint(paths) -> str:
    """Stable content hash over a list of files (size + first 64 KiB
    each): cheap enough for checkpoints, sensitive enough to detect a
    corpus or weight change. Used to invalidate derived caches whose
    inputs changed — the exists-skip idempotency everywhere else is
    blind to *stale* outputs (round-3 advisor finding)."""
    import hashlib

    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(p.encode())
        if os.path.isfile(p):
            h.update(str(os.path.getsize(p)).encode())
            with open(p, "rb") as f:
                h.update(f.read(65536))
        else:
            h.update(b"missing")
    return h.hexdigest()[:16]


def check_fp(marker: str, fp: str, stale_paths) -> None:
    """If ``marker`` doesn't hold ``fp``, delete ``stale_paths`` (dirs or
    files) and write the marker so the caller's stage regenerates them."""
    import shutil

    old = None
    if os.path.exists(marker):
        with open(marker) as f:
            old = f.read().strip()
    if old == fp:
        return
    for p in stale_paths:
        if os.path.isdir(p):
            print(f"stale (inputs changed): removing {p}", flush=True)
            shutil.rmtree(p)
        elif os.path.exists(p):
            print(f"stale (inputs changed): removing {p}", flush=True)
            os.remove(p)
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as f:
        f.write(fp)


def corpus_fingerprint(origin_dir: str) -> str:
    import glob

    return fingerprint(
        glob.glob(os.path.join(origin_dir, "synth_*", "scene_*", ".done"))
    )


def run(cmd, **kw):
    print(f"\n=== {' '.join(cmd)}", flush=True)
    t0 = time.time()
    # append, don't clobber: PYTHONPATH may carry the TPU PJRT plugin
    prev = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{prev}" if prev else REPO)
    try:
        r = subprocess.run(
            cmd, cwd=REPO, env=env,
            timeout=STAGE_TIMEOUT or None, **kw,
        )
        rc = r.returncode
    except subprocess.TimeoutExpired:
        # a wedged device session hangs forever on a TCP recv; fail the
        # stage fast so reruns (idempotent caches) can resume
        print(f"=== TIMEOUT after {STAGE_TIMEOUT:.0f}s", flush=True)
        sys.exit(124)
    print(f"=== done rc={rc} in {time.time()-t0:.0f}s", flush=True)
    if rc != 0:
        sys.exit(rc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--origin-dir", default="./data/origin_data")
    ap.add_argument("--cache-root", default="./data/YOHO_SYNTH")
    ap.add_argument("--model-dir", default="./model")
    # Steps are cumulative across rounds via the model_release bootstrap
    # below — a resumed run continues to the target, it does not re-run.
    ap.add_argument("--fcgf-steps", type=int, default=12000)
    ap.add_argument("--fcgf-seconds", type=float, default=3600)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--max-iter", type=int, default=1000)
    ap.add_argument(
        "--trainset-scenes",
        default=None,
        help="comma-separated scene subset for trainset baking (the FCGF "
        "corpus can be much larger than the PartI bake set)",
    )
    ap.add_argument(
        "--train-scenes", type=int, default=48,
        help="synthetic train-corpus size in scenes (seed-deterministic; "
        "growing it only ADDS scenes, but changes the corpus fingerprint "
        "and therefore invalidates trainset/eval caches on purpose)",
    )
    ap.add_argument(
        "--stage-timeout", type=float, default=0,
        help="per-stage wall-clock cap in seconds (0 = none); stages "
        "are idempotent so a timed-out run can simply be relaunched",
    )
    ap.add_argument(
        "--stage",
        default="all",
        choices=["all", "corpus", "fcgf", "trainset", "part1", "part2",
                 "eval", "eval_untrained", "results", "bench"],
    )
    args = ap.parse_args()
    global STAGE_TIMEOUT
    STAGE_TIMEOUT = args.stage_timeout
    py = sys.executable
    stages = (
        ["corpus", "fcgf", "trainset", "part1", "part2", "eval",
         "eval_untrained", "results", "bench"]
        if args.stage == "all"
        else [args.stage]
    )

    # Bootstrap from committed release checkpoints (model_release/,
    # scripts/export_release.py) BEFORE any stage dispatch, so that
    # --stage part1/part2/eval on a fresh clone also sees the committed
    # weights (round-3 advisor finding: it only ran under 'fcgf').
    # model/ and data/ are gitignored, so a fresh round otherwise
    # restarts everything from step 0. The release file has zeroed Adam
    # moments — training resumes with restarted optimizer state.
    for part in ("Backbone", "PartI", "PartII"):
        rel = os.path.join(REPO, "model_release", part, "model_best.pkl")
        dst_dir = os.path.join(args.model_dir, part)
        if not (os.path.exists(rel) and not os.path.exists(
            os.path.join(dst_dir, "model.pkl")
        )):
            continue
        # Provenance guard: PartI/PartII releases are functions of the
        # backbone they were trained on (export_release records its
        # fingerprint in a .backbone_fp sidecar). If the live backbone
        # differs, re-copying would resurrect weights a fingerprint wipe
        # just invalidated (observed live in round 4: a retried trainset
        # stage re-bootstrapped stale PartI/PartII after the wipe).
        sidecar = os.path.join(REPO, "model_release", part, ".backbone_fp")
        if part != "Backbone" and os.path.exists(sidecar):
            live_bb = os.path.join(args.model_dir, "Backbone", "model_best.pkl")
            ref_bb = live_bb if os.path.exists(live_bb) else os.path.join(
                REPO, "model_release", "Backbone", "model_best.pkl"
            )
            with open(sidecar) as f:
                want = f.read().split()
            if fingerprint([ref_bb]) not in want:
                print(
                    f"skip bootstrap of {part}: release was trained on a "
                    "different backbone (.backbone_fp mismatch)",
                    flush=True,
                )
                continue
        import shutil

        os.makedirs(dst_dir, exist_ok=True)
        shutil.copy(rel, os.path.join(dst_dir, "model.pkl"))
        shutil.copy(rel, os.path.join(dst_dir, "model_best.pkl"))
        print(f"bootstrapped {part} from model_release/", flush=True)

    if "corpus" in stages:
        sys.path.insert(0, REPO)
        from yoho_tpu.data.synthetic import generate_corpus

        out = generate_corpus(args.origin_dir, train_scenes=args.train_scenes)
        print(f"corpus: {out}", flush=True)

    train_cache = os.path.join(args.cache_root, "train_cache")
    bb_best = os.path.join(args.model_dir, "Backbone", "model_best.pkl")
    p1_best = os.path.join(args.model_dir, "PartI", "model_best.pkl")
    p2_best = os.path.join(args.model_dir, "PartII", "model_best.pkl")

    if "fcgf" in stages:
        # A corpus change replaces the held-out val pairs; the stored
        # best val loss (measured on the old pairs) must not gate
        # model_best saves against the new ones.
        fp = corpus_fingerprint(args.origin_dir)
        marker = os.path.join(args.model_dir, "Backbone", ".corpus_fp")
        reset = not (
            os.path.exists(marker) and open(marker).read().strip() == fp
        )
        run([
            py, "scripts/train_fcgf.py", "--dataset", "synth_train",
            "--origin-dir", args.origin_dir, "--model-dir", args.model_dir,
            "--val-scenes", VAL, "--steps", str(args.fcgf_steps),
            "--max-seconds", str(args.fcgf_seconds),
        ] + (["--reset-best"] if reset else []))
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as f:
            f.write(fp)

    if "trainset" in stages:
        # The lifted features (and everything baked from them) are a
        # function of (corpus, backbone weights): invalidate the cache
        # AND the downstream PartI/PartII models when either changed.
        fp = corpus_fingerprint(args.origin_dir) + fingerprint([bb_best])
        marker = os.path.join(args.cache_root, ".train_cache_fp")
        stale = [train_cache,
                 os.path.join(args.model_dir, "PartI"),
                 os.path.join(args.model_dir, "PartII")]
        if not os.path.exists(marker):
            # Fresh clone: the marker lives in the gitignored cache_root,
            # so its absence is NOT evidence of changed inputs. If the
            # live backbone matches the committed release provenance
            # sidecar, the bootstrapped PartI/PartII weights are valid —
            # don't wipe them (advisor round-4 finding); the (absent)
            # train_cache still regenerates.
            sidecar = os.path.join(REPO, "model_release", "PartI", ".backbone_fp")
            if os.path.exists(sidecar):
                with open(sidecar) as f:
                    want = f.read().split()
                if os.path.exists(bb_best) and fingerprint([bb_best]) in want:
                    print(
                        "fresh marker: backbone matches release sidecar; "
                        "keeping bootstrapped PartI/PartII",
                        flush=True,
                    )
                    stale = [train_cache]
        check_fp(marker, fp, stale)
        run([
            py, "scripts/trainset_gen.py", "--dataset", "synth_train",
            "--origin-dir", args.origin_dir, "--model-dir", args.model_dir,
            "--val-scenes", VAL,
            "--output-dir", train_cache,
        ] + (
            ["--scenes", args.trainset_scenes] if args.trainset_scenes else []
        ))

    if "part1" in stages:
        run([
            py, "scripts/train.py", "--part", "PartI",
            "--data-dir", train_cache,
            "--model-dir", args.model_dir, "--epochs", str(args.epochs),
        ])

    if "part2" in stages:
        run([
            py, "scripts/train.py", "--part", "PartII",
            "--data-dir", train_cache,
            "--model-dir", args.model_dir, "--epochs", str(args.epochs),
        ])

    if "eval" in stages:
        fp = corpus_fingerprint(args.origin_dir) + fingerprint(
            [bb_best, p1_best, p2_best]
        )
        check_fp(
            os.path.join(args.cache_root, ".eval_trained_fp"), fp,
            [os.path.join(args.cache_root, "eval_trained")],
        )
        for part in ("PartI", "PartII"):
            run([
                py, "scripts/test.py", "--part", part, "--dataset", "synth_test",
                "--origin-dir", args.origin_dir, "--model-dir", args.model_dir,
                "--cache-dir", os.path.join(args.cache_root, "eval_trained"),
                "--max-iter", str(args.max_iter),
                "--out-json",
                os.path.join(args.cache_root, f"eval_trained_{part}.json"),
            ])

    if "eval_untrained" in stages:
        check_fp(
            os.path.join(args.cache_root, ".eval_untrained_fp"),
            corpus_fingerprint(args.origin_dir),
            [os.path.join(args.cache_root, "eval_untrained")],
        )
        empty = os.path.join(args.cache_root, "no_model")
        os.makedirs(empty, exist_ok=True)
        run([
            py, "scripts/test.py", "--part", "PartI", "--dataset", "synth_test",
            "--origin-dir", args.origin_dir, "--model-dir", empty,
            "--cache-dir", os.path.join(args.cache_root, "eval_untrained"),
            "--max-iter", str(args.max_iter), "--allow-random",
            "--out-json",
            os.path.join(args.cache_root, "eval_untrained_PartI.json"),
        ])

    if "results" in stages:
        rows = []
        for tag, part in [
            ("YOHO-C (trained)", "eval_trained_PartI"),
            ("YOHO-O (trained)", "eval_trained_PartII"),
            ("YOHO-C (untrained baseline)", "eval_untrained_PartI"),
        ]:
            fn = os.path.join(args.cache_root, f"{part}.json")
            if not os.path.exists(fn):
                continue
            with open(fn) as f:
                d = json.load(f)
            rows.append((tag, d))
        md = [
            "# RESULTS — synthetic 3DMatch-style corpus",
            "",
            "Full ladder trained from scratch in-repo (no reference",
            "checkpoints exist in this mirror): `scripts/run_synth_ladder.py`",
            "= corpus gen -> FCGF -> trainset -> PartI -> PartII -> eval.",
            "Protocol: Redwood RR via `yoho_tpu/benchmark/rr.py` (reference",
            "`utils/RR_cal.py`), FMR tau_1=0.05 tau_2=0.1, RR tau_3=0.2,",
            f"RANSAC max_iter={args.max_iter}. Test scenes are held out",
            "(never seen in FCGF/PartI/PartII training); gt rotations are",
            "arbitrary SO(3), not icosahedral elements.",
            "",
            "| pipeline | FMR | mean inlier ratio | Registration Recall |",
            "|---|---|---|---|",
        ]
        for tag, d in rows:
            md.append(
                f"| {tag} | {d['FMR']:.3f} | {d['inlier_ratio']:.3f} "
                f"| {d['registration_recall']:.3f} |"
            )
        md += ["", "Raw JSON: `data/YOHO_SYNTH/eval_*.json` (stage timings inside)."]
        out_fn = os.path.join(REPO, "RESULTS.md")
        # Preserve hand-written analysis: everything from the first
        # second-level heading onward survives a table refresh (this
        # stage once clobbered the round-5 commentary).
        tail = ""
        if os.path.exists(out_fn):
            old = open(out_fn).read()
            k = old.find("\n## ")
            if k >= 0:
                tail = old[k:]
        with open(out_fn, "w") as f:
            f.write("\n".join(md) + "\n" + tail)
        print("\n".join(md))

    if "bench" in stages:
        # STRICT correctness gate (round-4 VERDICT item 2): a ladder
        # that produced trained weights must also produce a bench whose
        # registration gate passes — regressions hard-fail the ladder
        # instead of shipping a `valid:false` number.
        env_note = dict(os.environ, YOHO_BENCH_STRICT="1")
        print("\n=== bench (YOHO_BENCH_STRICT=1)", flush=True)
        t0 = time.time()
        prev = os.environ.get("PYTHONPATH", "")
        env_note["PYTHONPATH"] = f"{REPO}:{prev}" if prev else REPO
        r = subprocess.run(
            [py, "bench.py"], cwd=REPO, env=env_note,
            timeout=STAGE_TIMEOUT or None,
        )
        print(f"=== bench rc={r.returncode} in {time.time()-t0:.0f}s", flush=True)
        if r.returncode != 0:
            sys.exit(r.returncode)


if __name__ == "__main__":
    main()
