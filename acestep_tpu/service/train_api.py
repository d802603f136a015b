"""Training REST service: start/stop/status for LoRA runs + dataset building.

Role parity with the reference's training REST (`acestep/api/train_api_*.py`:
start LoRA/LoKR runs, dataset service, status/stop, export). Runs the trainer
in a background thread; metrics stream from the trainer's JSONL file.
"""

from __future__ import annotations

import json
import os
import threading
import time
import traceback
from typing import Any, Dict, List, Optional


class TrainingService:
    def __init__(self, dit_handler, llm_handler=None):
        self.dit_handler = dit_handler
        self.llm_handler = llm_handler
        self._runs: Dict[str, Dict[str, Any]] = {}
        self._lock = threading.Lock()

    # ------------------------------------------------------------------

    def start_run(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        import uuid

        from acestep_tpu.training.dataset import PreprocessedDataset
        from acestep_tpu.training.trainer import LoRAConfig, LoRATrainer, TrainingConfig

        run_id = uuid.uuid4().hex[:12]
        dataset_dir = payload["dataset_dir"]
        output_dir = payload.get("output_dir", f"./lora_runs/{run_id}")

        lcfg = LoRAConfig(
            rank=int(payload.get("rank", 32)),
            alpha=float(payload.get("alpha", 32.0)),
            adapter_type=str(payload.get("adapter_type", "lora")).lower(),
            lokr_factor=int(payload.get("lokr_factor", 8)),
        )
        tcfg = TrainingConfig(
            learning_rate=float(payload.get("learning_rate", 1e-4)),
            max_steps=int(payload.get("max_steps", 1000)),
            batch_size=int(payload.get("batch_size", 1)),
            gradient_accumulation_steps=int(payload.get("gradient_accumulation_steps", 1)),
            checkpoint_every=int(payload.get("checkpoint_every", 200)),
            output_dir=output_dir,
            resume_from=payload.get("resume_from"),
            seed=int(payload.get("seed", 0)),
        )

        state = {
            "status": "starting",
            "step": 0,
            "loss": None,
            "started": time.time(),
            "output_dir": output_dir,
            "error": None,
            "stop_requested": False,
        }
        with self._lock:
            self._runs[run_id] = state

        def worker():
            try:
                ds = PreprocessedDataset(dataset_dir)
                # Training uses the unstacked parameter layout; the serving
                # handler stacks params, so rebuild the decoder list view when
                # needed (stacked → per-layer slices).
                base = self._unstacked_params()
                trainer = LoRATrainer(base, self.dit_handler.config, lcfg, tcfg)
                state["status"] = "running"
                for step, loss, _msg in trainer.train(ds.batches(tcfg.batch_size)):
                    state["step"], state["loss"] = step, loss
                    if state["stop_requested"]:
                        trainer.save_checkpoint()
                        break
                state["status"] = "stopped" if state["stop_requested"] else "completed"
                state["adapter_path"] = os.path.join(output_dir, "adapter.npz")
            except Exception as e:  # noqa: BLE001 — surfaced via status API
                state["status"] = "failed"
                state["error"] = f"{e}\n{traceback.format_exc()}"

        threading.Thread(target=worker, daemon=True).start()
        return {"run_id": run_id, "output_dir": output_dir}

    def _unstacked_params(self) -> Dict[str, Any]:
        """Recover per-layer decoder params from the stacked serving layout."""
        from acestep_tpu.params import unstack_decoder_params

        return unstack_decoder_params(self.dit_handler.params, self.dit_handler.config)

    def export_adapter(self, run_id: str, target_dir: Optional[str] = None) -> Dict[str, Any]:
        """Export a run's trained adapter for serving (ref train REST export
        endpoint): returns the adapter.npz path, optionally copying it to
        `target_dir` so the LoRA REST ops can load it by name."""
        import shutil

        with self._lock:
            state = self._runs.get(run_id)
        if state is None:
            return {"success": False, "error": f"unknown run {run_id}"}
        adapter = os.path.join(state["output_dir"], "adapter.npz")
        if not os.path.exists(adapter):
            return {"success": False, "error": "no adapter checkpoint written yet"}
        out = adapter
        if target_dir:
            os.makedirs(target_dir, exist_ok=True)
            out = os.path.join(target_dir, f"{run_id}.npz")
            shutil.copy2(adapter, out)
        return {"success": True, "adapter_path": out, "step": state.get("step")}

    def status(self, run_id: str) -> Optional[Dict[str, Any]]:
        with self._lock:
            state = self._runs.get(run_id)
        if state is None:
            return None
        out = {k: v for k, v in state.items() if k != "stop_requested"}
        metrics = os.path.join(state["output_dir"], "metrics.jsonl")
        if os.path.exists(metrics):
            with open(metrics) as f:
                lines = f.readlines()[-20:]
            out["recent_metrics"] = [json.loads(l) for l in lines if l.strip()]
        return out

    def stop(self, run_id: str) -> bool:
        with self._lock:
            state = self._runs.get(run_id)
            if state is None:
                return False
            state["stop_requested"] = True
        return True

    def list_runs(self) -> Dict[str, Any]:
        with self._lock:
            return {
                rid: {
                    "status": s["status"], "step": s["step"], "loss": s["loss"],
                    "output_dir": s.get("output_dir"), "error": s.get("error"),
                }
                for rid, s in self._runs.items()
            }

    # ------------------------------------------------------------------

    def build_dataset(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        """Scan → label → preprocess an audio directory into training tensors
        (ref dataset_builder_modules flow). Labels come from sidecar files
        (<stem>.caption.txt / .lyrics.txt / .json), any CSV with a `file`
        column, caller-supplied captions/lyrics dicts, and — when
        `label_with_lm` is set and an LM handler is available — LM-assisted
        annotation via understand-on-codes (ref label_single.py:12-120)."""
        from acestep_tpu.training.dataset_builder import DatasetBuilder

        audio_dir = payload["audio_dir"]
        out_dir = payload.get("output_dir", audio_dir.rstrip("/") + "_tensors")
        captions: Dict[str, str] = payload.get("captions", {})
        lyrics: Dict[str, str] = payload.get("lyrics", {})

        builder = DatasetBuilder(self.dit_handler, self.llm_handler)
        samples, scan_msg = builder.scan_directory(audio_dir)
        for s in samples:
            if s.filename in captions:
                s.caption = captions[s.filename]
            if s.filename in lyrics:
                s.lyrics = lyrics[s.filename]
        label_msgs: List[str] = []
        if payload.get("label_with_lm") and self.llm_handler is not None:
            label_msgs = builder.label_all(
                format_lyrics=bool(payload.get("format_lyrics")),
                temperature=float(payload.get("label_temperature", 0.7)),
            )
            builder.save_labels()
        written, msg = builder.preprocess_to_tensors(
            out_dir, max_duration=float(payload.get("max_duration", 240.0))
        )
        entries = [{"file": w} for w in written]
        errors = {}
        labels_preview = [
            {"file": s.filename, "caption": s.caption, "bpm": s.bpm,
             "keyscale": s.keyscale, "language": s.language, "source": s.label_source}
            for s in samples[:20]
        ]
        return {"output_dir": out_dir, "samples": len(entries), "errors": errors,
                "scan": scan_msg, "status": msg, "labels": labels_preview,
                "label_log": label_msgs[:20]}
