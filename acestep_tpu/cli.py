"""Command-line interface: generate / serve / train / profile.

Role parity with the reference's launchers (`cli.py`, `acestep_v15_pipeline.py`
console scripts, `train.py`, `profile_inference.py`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _add_common_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--checkpoint-dir", default=os.environ.get("ACESTEP_CONFIG_PATH"))
    p.add_argument("--lm-checkpoint-dir", default=os.environ.get("ACESTEP_LM_MODEL_PATH"))
    p.add_argument("--random-init", action="store_true", help="dev mode: random weights")
    p.add_argument("--dp", type=int, default=int(os.environ.get("ACESTEP_TPU_DP", 1)),
                   help="data-parallel mesh axis (shards the request batch)")
    p.add_argument("--sp", type=int, default=int(os.environ.get("ACESTEP_TPU_SP", 1)),
                   help="sequence-parallel mesh axis (shards the latent-time axis)")
    p.add_argument("--tp", type=int, default=int(os.environ.get("ACESTEP_TPU_TP", 1)),
                   help="tensor-parallel mesh axis (shards attention/MLP kernels)")


def _apply_mesh(dit, llm, args) -> None:
    """Wire --dp/--sp/--tp into the serving path (no-op at 1×1×1)."""
    if args.dp * args.sp * args.tp <= 1:
        return
    dit.enable_mesh(dp=args.dp, sp=args.sp, tp=args.tp)
    print(f"mesh enabled: dp={args.dp} sp={args.sp} tp={args.tp}")
    if llm is not None and args.tp > 1:
        llm.enable_tensor_parallel(dit.mesh)


def _compile_cache() -> None:
    """Persistent XLA compile cache for commands that actually compile —
    NOT in main(), so `--help`/`download`/`verify-checkpoint` never pay the
    jax import."""
    from acestep_tpu.utils.compile_cache import enable

    enable()


def cmd_generate(args) -> int:
    _compile_cache()
    from acestep_tpu.lm.handler import LLMHandler
    from acestep_tpu.pipeline.handler import AceStepHandler
    from acestep_tpu.service.inference import generate_music
    from acestep_tpu.service.params import GenerationConfig, GenerationParams

    dit = AceStepHandler()
    print(dit.initialize_service(args.checkpoint_dir, random_init=args.random_init or None))
    llm = None
    if args.thinking:
        llm = LLMHandler()
        print(llm.initialize(args.lm_checkpoint_dir, random_init=args.random_init or None))
    _apply_mesh(dit, llm, args)

    params = GenerationParams(
        caption=args.caption,
        lyrics=args.lyrics,
        duration=args.duration,
        task_type=args.task,
        thinking=args.thinking,
        seed=args.seed,
        inference_steps=args.steps,
        shift=args.shift,
    )
    cfg = GenerationConfig(
        batch_size=args.batch_size,
        audio_format=args.format,
        output_dir=args.output_dir,
        use_random_seed=args.seed < 0,
    )
    result = generate_music(dit, llm, params, cfg)
    print(result.status_message)
    if not result.success:
        print(result.error, file=sys.stderr)
        return 1
    for a in result.audios:
        print("  ", a["path"])
    return 0


def cmd_download(args) -> int:
    """Per-component ensure/download of the standard checkpoint set (ref
    model_downloader.py:210-308 ensure loop). Exits nonzero when any
    component of any requested model is still missing — the first step of
    the real-weights readiness drill (README 'Certifying an install')."""
    from acestep_tpu.utils.downloader import ensure_components

    names = [n.strip() for n in args.models.split(",") if n.strip()]
    ok = True
    for name in names:
        out = ensure_components(name, args.cache_dir)
        missing = [c for c, good in out["components"].items() if not good]
        state = "complete" if not missing else f"MISSING: {', '.join(missing)}"
        print(f"{name}: {out['path'] or '(no source reachable)'} — {state}"
              + ("  [downloaded]" if out["downloaded"] else ""))
        ok = ok and not missing
    return 0 if ok else 1


def cmd_verify_checkpoint(args) -> int:
    """Verify one checkpoint dir component-by-component (DiT layout unless the
    dir name says lm). Step 2 of the readiness drill; step 3 is
    `python tools/parity_check.py <dir>` against the torch reference."""
    from acestep_tpu.utils.downloader import (
        DIT_CHECKPOINT_COMPONENTS,
        LM_CHECKPOINT_COMPONENTS,
        verify_checkpoint,
    )

    comps = (
        LM_CHECKPOINT_COMPONENTS
        if args.lm or "lm" in os.path.basename(os.path.normpath(args.path)).lower()
        else DIT_CHECKPOINT_COMPONENTS
    )
    status = verify_checkpoint(args.path, comps)
    for comp, good in status.items():
        print(f"  {comp:>14}: {'ok' if good else 'MISSING'}")
    if all(status.values()):
        print(f"{args.path}: complete")
        return 0
    print(f"{args.path}: INCOMPLETE")
    return 1


def cmd_generate_examples(args) -> int:
    """Batch-generate example params via the LM (ref generate_examples.py:
    N create-sample calls saved as examples/<dir>/example_NN.json in the
    params-file format the UI's Sample-example button and Load-params read)."""
    _compile_cache()
    from acestep_tpu.lm.handler import LLMHandler
    from acestep_tpu.service.inference import create_sample

    llm = LLMHandler()
    print(llm.initialize(args.lm_checkpoint_dir, random_init=args.random_init or None))
    os.makedirs(args.output_dir, exist_ok=True)
    written = 0
    for i in range(args.num):
        try:
            out = create_sample(llm, args.query)
        except Exception as e:  # noqa: BLE001 — keep generating the rest
            print(f"example {i + 1} failed: {e}", file=sys.stderr)
            continue
        md = out["metadata"]
        example = {
            "think": True,
            "caption": md.get("caption", ""),
            "lyrics": md.get("lyrics", "[Instrumental]"),
            "bpm": md.get("bpm"),
            "duration": md.get("duration"),
            "keyscale": md.get("keyscale", ""),
            "language": md.get("language", "unknown"),
            "timesignature": str(md.get("timesignature", "4")),
        }
        path = os.path.join(args.output_dir, f"example_{args.start_index + written:02d}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(example, f, indent=4, ensure_ascii=False)
        written += 1
        print(f"wrote {path}")
    return 0 if written else 1


def run_warmup(dit, warmup_spec: str, llm=None) -> None:
    """Compile the denoise/decode programs for the expected request shapes
    BEFORE the server binds its port, so first requests don't pay the
    20-40 s trace+compile (the role of the reference's COMPILE_MODEL /
    torch.compile warmup, acestep_v15_pipeline.py env). Spec:
    'BxD,BxD,...' (batch x duration-seconds), e.g. '1x30,2x60,4x60'.

    The token 'lm' warms the planner's draft/understand programs
    (create_sample prefill + constrained decode) — cold they cost minutes
    on a first sample_mode/chat request, and the compiles land in the
    persistent cache so later restarts replay them in seconds."""
    for spec in warmup_spec.split(","):
        spec = spec.strip()
        if spec.lower() == "lm":
            if llm is None or not getattr(llm, "initialized", False):
                print("[warmup] lm requested but no LM initialized — skipped")
                continue
            t0 = time.time()
            llm.create_sample_from_query("warmup", seed=0)
            print(f"[warmup] lm draft programs compiled+ran in {time.time() - t0:.1f}s")
            continue
        b, _, d = spec.partition("x")
        b, d = int(b), float(d or 30)
        t0 = time.time()
        dit.generate_music(
            captions=["warmup"] * b, lyrics=["[Instrumental]"] * b,
            audio_duration=d, batch_size=b, seeds=list(range(b)),
            use_random_seed=False, decode_audio=True,
        )
        print(f"[warmup] {b}x{d:g}s compiled+ran in {time.time() - t0:.1f}s")


def cmd_serve(args) -> int:
    _compile_cache()
    from acestep_tpu.lm.handler import LLMHandler
    from acestep_tpu.pipeline.handler import AceStepHandler
    from acestep_tpu.service.api_server import serve

    # Startup component check (ref init_service per-component ensure): a
    # named checkpoint dir must be complete before binding the port, aborting
    # with the components named instead of crashing mid-request. The dir is
    # always verified with the DiT layout (that is what --checkpoint-dir
    # loads); a re-download is only attempted when the dir name is a known
    # catalog entry, never by guessing a repo id from the basename.
    if args.checkpoint_dir and not args.random_init:
        from acestep_tpu.utils.downloader import (
            DIT_CHECKPOINT_COMPONENTS,
            MODEL_REPOS,
            ensure_components,
            verify_checkpoint,
        )

        status = verify_checkpoint(args.checkpoint_dir, DIT_CHECKPOINT_COMPONENTS)
        missing = [c for c, good in status.items() if not good]
        name = os.path.basename(os.path.normpath(args.checkpoint_dir))
        if missing and name in MODEL_REPOS:
            out = ensure_components(
                name, os.path.dirname(os.path.normpath(args.checkpoint_dir)) or "."
            )
            missing = [c for c, good in out["components"].items() if not good]
        if missing:
            print(f"checkpoint {args.checkpoint_dir} incomplete — missing: "
                  f"{', '.join(missing)} (run `acestep-tpu download` with network "
                  f"access, then `verify-checkpoint`)", file=sys.stderr)
            return 1

    dit = AceStepHandler()
    print(dit.initialize_service(args.checkpoint_dir, random_init=args.random_init or None))
    llm = LLMHandler()
    print(llm.initialize(args.lm_checkpoint_dir, random_init=args.random_init or None))
    _apply_mesh(dit, llm, args)
    # Multi-model registry: ACESTEP_CONFIG_PATH2/3 load extra DiT models,
    # selectable via the request's "model" field (ref api_server.py:1274-1291).
    extra = {}
    for n in (2, 3):
        path = os.environ.get(f"ACESTEP_CONFIG_PATH{n}")
        if path and os.path.isdir(path):
            h = AceStepHandler()
            print(f"[model {n}] " + h.initialize_service(path))
            extra[os.path.basename(os.path.normpath(path))] = h
    if args.warmup:
        run_warmup(dit, args.warmup, llm=llm)

    server = serve(dit, llm, args.host, args.port, args.api_key, args.output_dir,
                   extra_dit_handlers=extra or None)
    print(f"listening on {args.host}:{args.port}")
    server.serve_forever()
    return 0


def cmd_train(args) -> int:
    _compile_cache()
    from acestep_tpu.pipeline.handler import AceStepHandler
    from acestep_tpu.training.dataset import PreprocessedDataset
    from acestep_tpu.training.trainer import LoRAConfig, LoRATrainer, TrainingConfig

    handler = AceStepHandler()
    print(handler.initialize_service(args.checkpoint_dir, random_init=args.random_init or None))
    # LoRA trains against the unstacked per-layer layout; the serving handler
    # stacks layers for scan, so convert (shared with the training REST path).
    from acestep_tpu.params import unstack_decoder_params

    # The handler already holds the (possibly random-init) weights — training
    # must start from the SAME base the serving path would use, and a second
    # init_acestep_params call would double the parameter memory.
    base = unstack_decoder_params(handler.params, handler.config)

    ds = PreprocessedDataset(args.dataset_dir)
    trainer = LoRATrainer(
        base,
        handler.config,
        LoRAConfig(rank=args.rank, alpha=args.alpha),
        TrainingConfig(
            learning_rate=args.lr,
            max_steps=args.max_steps,
            batch_size=args.batch_size,
            output_dir=args.output_dir,
            resume_from=args.resume_from,
        ),
    )
    for step, loss, msg in trainer.train(ds.batches(args.batch_size)):
        if step % 10 == 0 or "[checkpoint]" in msg:
            print(msg)
    print(f"done: adapter at {os.path.join(args.output_dir, 'adapter.npz')}")
    return 0


def cmd_build_dataset(args) -> int:
    _compile_cache()
    """Scan/label/preprocess an audio directory (the annotation-script role of
    ref `scripts/lora_data_prepare/`, using the built-in LM instead of
    external captioning/transcription services)."""
    from acestep_tpu.pipeline.handler import AceStepHandler
    from acestep_tpu.training.dataset_builder import DatasetBuilder

    dit = AceStepHandler()
    print(dit.initialize_service(args.checkpoint_dir, random_init=args.random_init or None))
    llm = None
    if args.label_with_lm:
        from acestep_tpu.lm.handler import LLMHandler

        llm = LLMHandler()
        print(llm.initialize(args.lm_checkpoint_dir, random_init=args.random_init or None))

    builder = DatasetBuilder(dit, llm)
    samples, msg = builder.scan_directory(args.audio_dir)
    print(f"scan: {msg}")
    if args.label_with_lm:
        for line in builder.label_all(format_lyrics=args.format_lyrics):
            print("  " + line)
        print(f"labels saved to {builder.save_labels()}")
    out_dir = args.output_dir or args.audio_dir.rstrip("/") + "_tensors"
    written, msg = builder.preprocess_to_tensors(out_dir, max_duration=args.max_duration)
    print(msg)
    return 0


def _profile_lm(args) -> int:
    """LM decode throughput (tokens/s) across batch sizes — the comparison
    point for nano-vllm's published 1 434 tok/s (Qwen3-0.6B, RTX 4070,
    reference `third_parts/nano-vllm/README.md:55-61`). Measures the jitted
    prefill and the on-device code-generation scan."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from acestep_tpu.lm import sampling
    from acestep_tpu.lm.handler import LLMHandler

    lm = LLMHandler()
    print(lm.initialize(args.lm_checkpoint_dir, random_init=args.random_init or None))
    n_steps = args.lm_tokens
    rows = []
    print(f"{'Batch':>6} {'Prefill(s)':>11} {'Decode(s)':>10} {'tok/s':>9}")
    for b in [int(x) for x in args.batches.split(",")]:
        prompts = ["# Caption\nan energetic synthwave track\n\n# Lyric\n[Instrumental]\n"] * b
        ids, mask, bucket = lm._encode_prompts(prompts, budget=n_steps + 8)
        code_start = max(lm.fsm.code_token_start, 0)
        n_codes = lm.fsm.num_code_tokens or min(4096, lm.config.vocab_size - code_start)

        def run():
            t0 = time.time()
            logits, cache = lm._prefill(ids, mask, bucket + n_steps + 8)
            positions = np.asarray([mask[i].sum() for i in range(b)], np.int32)
            first = jnp.argmax(logits[:, code_start : code_start + n_codes], axis=-1)
            feed = (first + code_start).astype(jnp.int32)
            float(jnp.sum(logits[:, :8]))  # sync prefill
            t1 = time.time()
            toks, _ = sampling.generate_codes_scan(
                lm.params, lm.config, feed, jnp.asarray(positions), cache,
                jax.random.PRNGKey(0), n_steps=n_steps - 1, code_start=code_start,
                n_codes=n_codes, temperature=0.85, top_k=0, top_p=0.9,
            )
            np.asarray(toks)
            return t1 - t0, time.time() - t1

        run()  # compile
        pre, dec = min([run() for _ in range(3)], key=lambda x: x[1])
        # The first code token is sampled from prefill logits (inside the
        # prefill span); the decode span covers n_steps - 1 tokens.
        rows.append({"batch": b, "prefill_s": pre, "decode_s": dec,
                     "tok_s": b * (n_steps - 1) / dec})
        print(f"{b:>6} {pre:>11.3f} {dec:>10.3f} {rows[-1]['tok_s']:>9.0f}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=2)
    return 0


def cmd_estimate(args) -> int:
    _compile_cache()
    """Gradient-sensitivity ranking of LoRA-targetable attention modules
    (Side-Step `estimate` parity, ref training_v2/estimate.py:26-261)."""
    from acestep_tpu.pipeline.handler import AceStepHandler
    from acestep_tpu.training.dataset import PreprocessedDataset
    from acestep_tpu.training.estimate import run_estimation

    handler = AceStepHandler()
    print(handler.initialize_service(args.checkpoint_dir, random_init=args.random_init or None))
    ds = PreprocessedDataset(args.dataset_dir)
    results = run_estimation(
        handler.params, handler.config,
        ds.batches(args.batch_size, shuffle=False),
        num_batches=args.num_batches, top_k=args.top_k,
        granularity=args.granularity, cfg_ratio=args.cfg_ratio,
    )
    print(f"{'rank':>4} {'sensitivity':>14}  module")
    for i, r in enumerate(results):
        print(f"{i + 1:>4} {r['sensitivity']:>14.5f}  {r['module']}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
    return 0


def cmd_profile(args) -> int:
    """Benchmark matrix: Duration × Batch × Think × Steps → Wall/LM/DiT/VAE
    seconds (ref `profile_inference.py --mode benchmark`,
    docs/en/BENCHMARK.md:96-120 table incl. the thinking column)."""
    _compile_cache()
    from acestep_tpu.pipeline.handler import AceStepHandler

    if args.lm:
        return _profile_lm(args)

    handler = AceStepHandler()
    print(handler.initialize_service(args.checkpoint_dir, random_init=args.random_init or None))

    think_modes = [t.strip().lower() in ("1", "true", "on", "yes")
                   for t in args.think.split(",")]
    llm = None
    if any(think_modes):
        from acestep_tpu.lm.handler import LLMHandler

        llm = LLMHandler()
        print(llm.initialize(args.lm_checkpoint_dir, random_init=args.random_init or None))

    durations = [int(d) for d in args.durations.split(",")]
    batches = [int(b) for b in args.batches.split(",")]
    steps_list = [int(s) for s in args.steps.split(",")]
    rows = []
    print(f"{'Dur(s)':>7} {'Batch':>6} {'Think':>6} {'Steps':>6} {'Wall(s)':>8} "
          f"{'LM(s)':>7} {'DiT(s)':>8} {'VAE(s)':>8} {'Xfer(s)':>8} {'audio_s/s':>10}")
    for d in durations:
        for b in batches:
            for think in think_modes:
                for steps in steps_list:
                    def run():
                        lm_cost = 0.0
                        codes = None
                        if think and llm is not None:
                            lm_out = llm.generate_with_stop_condition(
                                caption="profiling run", lyrics="[Instrumental]",
                                target_duration=float(d), batch_size=b, seed=1,
                            )
                            lm_cost = lm_out["time_costs"].get("lm_total_time_cost", 0.0)
                            codes = lm_out.get("batch_audio_codes")
                        out = handler.generate_music(
                            captions=["profiling run"] * b, lyrics=["[Instrumental]"] * b,
                            audio_duration=float(d), batch_size=b,
                            seeds=list(range(b)), use_random_seed=False,
                            inference_steps=None if steps == 8 else steps,
                            audio_code_strings=codes,
                        )
                        return out, lm_cost

                    run()  # warmup/compile
                    if args.trace_dir:
                        # XLA/TPU trace viewable in TensorBoard/Perfetto — the
                        # torch.profiler-harness equivalent (ref modeling __main__).
                        import jax

                        with jax.profiler.trace(args.trace_dir):
                            t0 = time.time()
                            out, lm_cost = run()
                            wall = time.time() - t0
                    else:
                        t0 = time.time()
                        out, lm_cost = run()
                        wall = time.time() - t0
                    tc = out["time_costs"]
                    rows.append({
                        "duration": d, "batch": b, "think": think,
                        "steps": out["num_steps"], "wall": wall, "lm": lm_cost,
                        "dit": tc["diffusion_time_cost"],
                        "vae": tc.get("vae_decode_time_cost", 0),
                        "transfer": tc.get("vae_decode_transfer_time_cost", 0),
                        "throughput": b * d / wall,
                        "throughput_device": b * d / max(
                            wall - tc.get("vae_decode_transfer_time_cost", 0), 1e-6
                        ),
                    })
                    r = rows[-1]
                    print(f"{d:>7} {b:>6} {str(think):>6} {r['steps']:>6} {r['wall']:>8.2f} "
                          f"{r['lm']:>7.2f} {r['dit']:>8.2f} {r['vae']:>8.2f} "
                          f"{r['transfer']:>8.2f} {r['throughput']:>10.2f}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=2)
    return 0


def main(argv=None) -> int:
    from acestep_tpu.utils.env import load_dotenv

    load_dotenv()  # .env → env vars (CLI args still take precedence)
    ap = argparse.ArgumentParser(prog="acestep-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="generate music from text")
    _add_common_model_args(g)
    g.add_argument("--caption", required=True)
    g.add_argument("--lyrics", default="[Instrumental]")
    g.add_argument("--duration", type=float, default=30.0)
    g.add_argument("--task", default="text2music")
    g.add_argument("--thinking", action="store_true")
    g.add_argument("--seed", type=int, default=-1)
    g.add_argument("--steps", type=int, default=8)
    g.add_argument("--shift", type=float, default=3.0)
    g.add_argument("--batch-size", type=int, default=1)
    g.add_argument("--format", default="flac")
    g.add_argument("--output-dir", default="./outputs")
    g.set_defaults(fn=cmd_generate)

    dl = sub.add_parser("download", help="ensure/download checkpoint components")
    dl.add_argument("--models",
                    default="acestep-v15-turbo,acestep-5Hz-lm-0.6B",
                    help="comma list of model names (see downloader.MODEL_REPOS)")
    dl.add_argument("--cache-dir",
                    default=os.environ.get("ACESTEP_CHECKPOINT_ROOT")
                    or os.path.expanduser("~/.cache/acestep_tpu/checkpoints"))
    dl.set_defaults(fn=cmd_download)

    ge = sub.add_parser("generate-examples",
                        help="batch-generate example params via the LM")
    _add_common_model_args(ge)
    ge.add_argument("--num", type=int, default=10)
    ge.add_argument("--query", default="", help="optional inspiration query")
    ge.add_argument("--output-dir", default="examples/params")
    ge.add_argument("--start-index", type=int, default=1)
    ge.set_defaults(fn=cmd_generate_examples)

    vc = sub.add_parser("verify-checkpoint", help="verify a checkpoint dir per component")
    vc.add_argument("path")
    vc.add_argument("--lm", action="store_true", help="use the LM checkpoint layout")
    vc.set_defaults(fn=cmd_verify_checkpoint)

    s = sub.add_parser("serve", help="start the REST job API server")
    _add_common_model_args(s)
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=8001)
    s.add_argument("--api-key", default=os.environ.get("ACESTEP_API_KEY"))
    s.add_argument("--output-dir", default="./outputs")
    s.add_argument("--warmup", default=os.environ.get("ACESTEP_WARMUP"),
                   help="precompile request shapes before binding the port, "
                        "e.g. '1x30,2x60,4x60' (batch x duration-seconds); "
                        "the token 'lm' warms the planner draft programs")
    s.set_defaults(fn=cmd_serve)

    t = sub.add_parser("train", help="LoRA fine-tune from preprocessed tensors")
    _add_common_model_args(t)
    t.add_argument("--dataset-dir", required=True)
    t.add_argument("--output-dir", default="./lora_output")
    t.add_argument("--rank", type=int, default=32)
    t.add_argument("--alpha", type=float, default=32.0)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--max-steps", type=int, default=1000)
    t.add_argument("--batch-size", type=int, default=1)
    t.add_argument("--resume-from", default=None)
    t.set_defaults(fn=cmd_train)

    bd = sub.add_parser("build-dataset", help="scan/label/preprocess audio into training tensors")
    _add_common_model_args(bd)
    bd.add_argument("--audio-dir", required=True)
    bd.add_argument("--output-dir", default=None)
    bd.add_argument("--label-with-lm", action="store_true",
                    help="LM-assisted captions/metas via understand-on-codes")
    bd.add_argument("--format-lyrics", action="store_true",
                    help="normalize preloaded lyrics with the LM")
    bd.add_argument("--max-duration", type=float, default=240.0)
    bd.set_defaults(fn=cmd_build_dataset)

    e = sub.add_parser("estimate", help="rank attention modules by gradient sensitivity")
    _add_common_model_args(e)
    e.add_argument("--dataset-dir", required=True)
    e.add_argument("--num-batches", type=int, default=10)
    e.add_argument("--batch-size", type=int, default=1)
    e.add_argument("--top-k", type=int, default=16)
    e.add_argument("--granularity", choices=["module", "layer"], default="module")
    e.add_argument("--cfg-ratio", type=float, default=0.0)
    e.add_argument("--json-out", default=None)
    e.set_defaults(fn=cmd_estimate)

    p = sub.add_parser("profile", help="benchmark matrix (duration × batch)")
    _add_common_model_args(p)
    p.add_argument("--durations", default="30,60,120")
    p.add_argument("--batches", default="1,2")
    p.add_argument("--think", default="false",
                   help="comma list of think modes, e.g. 'false,true' (needs LM)")
    p.add_argument("--steps", default="8", help="comma list of step counts, e.g. '8,16'")
    p.add_argument("--json-out", default=None)
    p.add_argument("--trace-dir", default=None,
                   help="capture a jax.profiler trace of each timed run")
    p.add_argument("--lm", action="store_true",
                   help="profile LM decode throughput instead of the DiT matrix")
    p.add_argument("--lm-tokens", type=int, default=300,
                   help="decode steps per LM throughput run (default 300 = 60 s of codes)")
    p.set_defaults(fn=cmd_profile)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
