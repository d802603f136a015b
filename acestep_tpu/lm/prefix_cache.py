"""Prefill/prefix KV reuse for the planner LM — TPU-native nano-vllm parity.

The reference vendors nano-vllm, whose serving wins come from paged KV blocks
with hash-based prefix caching (`third_parts/nano-vllm/nanovllm/engine/
block_manager.py`). Page tables are a poor fit for XLA's static shapes, so
this module delivers the same two wins TPU-natively:

1. **Intra-batch dedup** — the two-phase planner prefilled identical prompt
   rows per sample (and per CFG branch). Unique rows prefill once and their
   KV rows broadcast back to the full batch with one gather on the batch
   axis (the XLA equivalent of nano-vllm's shared prefix blocks).
2. **Cross-request reuse** — an LRU of full-prompt KV rows keyed by the
   exact token prefix, so regenerations (same caption, new seed — the
   dominant serving pattern) skip prefill entirely. Entries are reusable
   only at the same padded bucket + cache capacity, keeping every consumer
   a statically-shaped program.

Disable with ACESTEP_TPU_LM_PREFIX_CACHE=0.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.models import qwen3


def enabled() -> bool:
    return os.environ.get("ACESTEP_TPU_LM_PREFIX_CACHE", "1") != "0"


class PrefillCache:
    """LRU of per-row prefill results (KV rows + last-token logits)."""

    def __init__(self, max_bytes: int = 512 * 1024 * 1024):
        self.max_bytes = max_bytes
        self._lru: "OrderedDict[Tuple, Dict[str, Any]]" = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0
        self.dedup_rows_saved = 0

    # -- bookkeeping ---------------------------------------------------

    @staticmethod
    def _entry_bytes(e: Dict[str, Any]) -> int:
        return int(e["k"].size * e["k"].dtype.itemsize * 2)

    def _evict(self) -> None:
        while self._bytes > self.max_bytes and self._lru:
            _, e = self._lru.popitem(last=False)
            self._bytes -= self._entry_bytes(e)

    def clear(self) -> None:
        self._lru.clear()
        self._bytes = 0

    def stats(self) -> Dict[str, int]:
        total = self.hits + self.misses
        return {
            "entries": len(self._lru),
            "bytes": self._bytes,
            "hits": self.hits,
            "misses": self.misses,
            "hit_rate": round(self.hits / total, 3) if total else 0.0,
            "dedup_rows_saved": self.dedup_rows_saved,
        }

    # -- core ----------------------------------------------------------

    def prefill(
        self,
        params,
        cfg,
        ids: np.ndarray,  # (R, L) right-padded to a bucket
        mask: np.ndarray,  # (R, L)
        total_len: int,  # KV capacity (bucket + generation budget)
        dtype,
    ) -> Tuple[jax.Array, qwen3.KVCache]:
        """Drop-in for `KVCache.create` + `qwen3.prefill` with dedup + reuse.

        Returns (logits (R, V), cache with R batch rows).
        """
        r, l = ids.shape
        valid = mask.sum(axis=1).astype(np.int64)

        # Order-preserving unique rows.
        row_keys: List[Tuple] = []
        uniq_index: Dict[Tuple, int] = {}
        inv = np.zeros(r, np.int32)
        uniq_rows: List[int] = []
        for i in range(r):
            key = (l, total_len, str(jnp.dtype(dtype)), ids[i, : valid[i]].tobytes())
            row_keys.append(key)
            if key not in uniq_index:
                uniq_index[key] = len(uniq_rows)
                uniq_rows.append(i)
            inv[i] = uniq_index[key]
        u = len(uniq_rows)
        self.dedup_rows_saved += r - u

        # Split unique rows into cache hits and misses.
        hit_entries: Dict[int, Dict[str, Any]] = {}
        miss_rows: List[int] = []
        for ui, i in enumerate(uniq_rows):
            e = self._lru.get(row_keys[i])
            if e is not None:
                self._lru.move_to_end(row_keys[i])
                hit_entries[ui] = e
                self.hits += 1
            else:
                miss_rows.append(ui)
                self.misses += 1

        miss_k = miss_v = miss_logits = None
        if miss_rows:
            sub_ids = np.stack([ids[uniq_rows[ui]] for ui in miss_rows])
            sub_mask = np.stack([mask[uniq_rows[ui]] for ui in miss_rows])
            cache = qwen3.KVCache.create(cfg, len(miss_rows), total_len, dtype)
            miss_logits, cache = qwen3.prefill(
                params, cfg, jnp.asarray(sub_ids), jnp.asarray(sub_mask), cache
            )
            miss_k, miss_v = cache.k, cache.v
            # Store per-row slices for future requests.
            for mi, ui in enumerate(miss_rows):
                e = {
                    "k": jax.lax.slice_in_dim(miss_k, mi, mi + 1, axis=1),
                    "v": jax.lax.slice_in_dim(miss_v, mi, mi + 1, axis=1),
                    "logits": miss_logits[mi],
                    "pos": int(valid[uniq_rows[ui]]),
                }
                key = row_keys[uniq_rows[ui]]
                if key not in self._lru:
                    self._bytes += self._entry_bytes(e)
                self._lru[key] = e
                self._lru.move_to_end(key)
            self._evict()

        # Assemble unique-row KV/logits in unique order, then broadcast to R.
        k_rows, v_rows, logit_rows = [], [], []
        miss_cursor = 0
        for ui in range(u):
            if ui in hit_entries:
                e = hit_entries[ui]
                k_rows.append(e["k"])
                v_rows.append(e["v"])
                logit_rows.append(e["logits"])
            else:
                k_rows.append(jax.lax.slice_in_dim(miss_k, miss_cursor, miss_cursor + 1, axis=1))
                v_rows.append(jax.lax.slice_in_dim(miss_v, miss_cursor, miss_cursor + 1, axis=1))
                logit_rows.append(miss_logits[miss_cursor])
                miss_cursor += 1

        inv_dev = jnp.asarray(inv)
        if u == 1:
            k_u, v_u = k_rows[0], v_rows[0]
            k_full = jnp.broadcast_to(k_u, k_u.shape[:1] + (r,) + k_u.shape[2:])
            v_full = jnp.broadcast_to(v_u, v_u.shape[:1] + (r,) + v_u.shape[2:])
            logits = jnp.broadcast_to(logit_rows[0][None], (r,) + logit_rows[0].shape)
        else:
            k_full = jnp.take(jnp.concatenate(k_rows, axis=1), inv_dev, axis=1)
            v_full = jnp.take(jnp.concatenate(v_rows, axis=1), inv_dev, axis=1)
            logits = jnp.take(jnp.stack(logit_rows), inv_dev, axis=0)
        length = jnp.asarray(int(valid.max()), jnp.int32)
        return logits, qwen3.KVCache(k_full, v_full, length)
