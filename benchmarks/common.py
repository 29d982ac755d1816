"""Shared helpers for the benchmark scripts."""

from __future__ import annotations


def headline_metrics(metrics: dict) -> dict:
    """Per-regime headline rows from an evaluation.json dict: ap /
    base_map / novel_map, unwrapping the moment evaluator's tIoU nesting
    (its block keys results under "map05")."""
    out = {}
    for regime, block in metrics.items():
        if not isinstance(block, dict):
            continue
        b = block.get("map05", block)
        out[regime] = {
            k: b.get(k) for k in ("ap", "base_map", "novel_map") if k in b
        }
    return out
