"""AOT serving export: freeze a trained model into a portable StableHLO
artifact.

Deployment capability beyond the reference, whose serving story ends at a
pickled ``checkpoint.pt`` that needs the full model zoo + torch to run
(/root/reference/utils.py:111-120). Here ``jax.export`` ahead-of-time
lowers the inference function — weights baked in as constants — to a
serialized StableHLO program that executes WITHOUT the model code, flax,
or the hparams bank, on any backend in the artifact's platform list
(default: cpu AND tpu — one artifact serves both, because export always
takes the plain-XLA path, never a Pallas kernel).

Artifact contract: input ``(batch, C, L)`` float32, output ``(batch,)``
float32 normalized-RUL predictions (multiply by the dataset's max_rul —
recorded in the metadata — for absolute RUL). The batch dimension is
symbolic by default, so one artifact serves any batch size; pass
``batch_size=N`` for a fixed-shape program (some backends specialize
better; the loader then pads/trims transparently).

CLI (from a training run's checkpoint.pkl or a reference checkpoint.pt):

    python -m gnn_rul_tpu.export --checkpoint run_dir/checkpoint.pkl \
        --GNN_method FC_STGNN --dataset CMAPSS --dataset_id FD001 \
        --out fc_stgnn_fd001.ghlo

    python -m gnn_rul_tpu.export --checkpoint checkpoint.pt ...   # torch

Serving:

    from gnn_rul_tpu.export import load_artifact
    model = load_artifact("fc_stgnn_fd001.ghlo")
    rul = model(x) * model.meta["max_rul"]
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Optional, Tuple

_MAGIC = b"GNNRULX1"


# --------------------------------------------------------------------- export

def _build_model(method: str, dataset: str, dataset_id: Optional[str],
                 model_hparams: Optional[Dict] = None):
    from .configs import hparams as hparams_bank
    from .train.algorithms import get_algorithm_spec

    spec = get_algorithm_spec(method)
    kwargs = dict(model_hparams or hparams_bank.model_hparams(
        dataset, dataset_id, method))
    kwargs.pop("fused", None)
    if spec.supports_fused:
        # Pallas kernels are per-platform Mosaic custom calls; the
        # multi-platform serving artifact must stay pure StableHLO.
        kwargs["fused"] = "off"
    return spec.model_cls(**kwargs)


def export_serving(method: str, dataset: str, dataset_id: Optional[str],
                   variables: Dict[str, Any], *,
                   batch_size: Optional[int] = None,
                   seq_len: Optional[int] = None,
                   precision: str = "fp32",
                   platforms: Tuple[str, ...] = ("cpu", "tpu"),
                   model_hparams: Optional[Dict] = None,
                   max_rul: Optional[float] = None,
                   ) -> Tuple[Dict[str, Any], bytes]:
    """Lower ``method``'s inference pass (weights from ``variables`` baked
    in) to serialized StableHLO. Returns ``(meta, blob)``.

    ``batch_size=None`` exports a symbolic batch dimension (one artifact,
    any batch). ``precision="bf16"`` reproduces the engine's compute-cast
    (bf16 matmuls, fp32 output). ``seq_len`` overrides the dataset
    config's window length (XJTU-SY's true raw length is 32768; the
    config's 30768 is the reference's stale value — BASELINE.md).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from .configs.data_configs import get_dataset_config

    cfg = get_dataset_config(dataset)
    n_ch = cfg.input_channels
    length = int(seq_len or cfg.sequence_len)
    model = _build_model(method, dataset, dataset_id, model_hparams)

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def cast(tree):
        if precision != "bf16":
            return tree
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)

    def infer(x):
        out = model.apply(
            {"params": cast(params), "batch_stats": cast(batch_stats)},
            cast(x), train=False)
        pred = out[0] if isinstance(out, tuple) else out
        return pred.reshape(-1).astype(jnp.float32)

    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
        spec_shape = (b, n_ch, length)
    else:
        spec_shape = (int(batch_size), n_ch, length)
    x_spec = jax.ShapeDtypeStruct(spec_shape, jnp.float32)

    # The Pallas whole-recurrence LSTM dispatch (auto at T>=256 on TPU)
    # must not fire inside a multi-platform artifact — and it costs
    # nothing here: the kernel's measured win is in the backward pass
    # (see nn.recurrent.lstm_impl_override).
    from .nn.recurrent import lstm_impl_override
    try:
        with lstm_impl_override("scan"):
            exported = jexport.export(jax.jit(infer),
                                      platforms=list(platforms))(x_spec)
    except Exception as e:
        if batch_size is None:
            raise RuntimeError(
                f"symbolic-batch export failed for {method} ({e!r}); "
                f"retry with a fixed batch_size=N") from e
        raise
    blob = bytes(exported.serialize())

    meta = {
        "format": "gnn_rul_tpu.serving.v1",
        "method": method,
        "dataset": dataset,
        "dataset_id": dataset_id,
        "input_shape": [None if batch_size is None else int(batch_size),
                        n_ch, length],
        "output": "normalized RUL, shape (batch,) float32",
        "precision": precision,
        "platforms": list(platforms),
        "max_rul": max_rul,
        "jax_version": jax.__version__,
    }
    return meta, blob


# ------------------------------------------------------------------ artifacts

def save_artifact(path: str, meta: Dict[str, Any], blob: bytes) -> str:
    meta_b = json.dumps(meta).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(meta_b)))
        f.write(meta_b)
        f.write(blob)
    os.replace(tmp, path)
    return path


class ServingModel:
    """A loaded serving artifact: ``meta`` + ``__call__(x) -> (batch,)``.

    Fixed-batch artifacts transparently pad the last partial batch (with
    row 0) and trim the result, so callers always get one prediction per
    input row.
    """

    def __init__(self, meta: Dict[str, Any], exported):
        self.meta = meta
        self._exported = exported
        self._batch = meta["input_shape"][0]

    def __call__(self, x):
        import numpy as np
        x = np.asarray(x, np.float32)
        _, n_ch, length = self.meta["input_shape"]
        if x.ndim != 3 or x.shape[1] != n_ch or x.shape[2] != length:
            raise ValueError(
                f"expected (batch, {n_ch}, {length}), got {x.shape}")
        if self._batch is None:
            return np.asarray(self._exported.call(x))
        n = x.shape[0]
        out = np.empty((n,), np.float32)
        bs = self._batch
        for i in range(0, n, bs):
            chunk = x[i:i + bs]
            if chunk.shape[0] < bs:
                pad = np.broadcast_to(chunk[:1],
                                      (bs - chunk.shape[0],) + chunk.shape[1:])
                chunk = np.concatenate([chunk, pad], axis=0)
            out[i:i + bs] = np.asarray(self._exported.call(chunk))[:n - i]
        return out


def load_artifact(path: str) -> ServingModel:
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a gnn_rul_tpu serving artifact")
        (meta_len,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(meta_len).decode())
        blob = f.read()
    return ServingModel(meta, jexport.deserialize(bytearray(blob)))


# ------------------------------------------------------------------------ CLI

def _load_variables(path: str, method: str, dataset: str,
                    dataset_id: Optional[str]):
    """Checkpoint -> (variables, hparams_or_None). Accepts this framework's
    checkpoint.pkl and the reference's checkpoint.pt."""
    if path.endswith(".pt"):
        from .compat import import_torch_checkpoint
        variables = import_torch_checkpoint(path, method, dataset=dataset,
                                            dataset_id=dataset_id)
        return variables, None
    from .train.checkpoint import load_checkpoint
    payload = load_checkpoint(path)
    variables = {"params": payload["params"],
                 "batch_stats": payload.get("batch_stats", {})}
    return variables, (payload.get("extra") or {}).get("hparams")


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Export a trained model as a portable serving artifact")
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint.pkl (this framework) or checkpoint.pt "
                         "(reference format, imported via compat)")
    ap.add_argument("--GNN_method", required=True)
    ap.add_argument("--dataset", required=True,
                    choices=["CMAPSS", "NCMAPSS", "PHM2012", "XJTU_SY"])
    ap.add_argument("--dataset_id", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch_size", type=int, default=0,
                    help="0 = symbolic batch (one artifact, any batch)")
    ap.add_argument("--seq_len", type=int, default=0,
                    help="override the dataset window length "
                         "(XJTU_SY true length: 32768)")
    ap.add_argument("--precision", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--max_rul", type=float, default=None,
                    help="recorded in metadata for denormalizing predictions")
    args = ap.parse_args(argv)

    variables, ckpt_hparams = _load_variables(
        args.checkpoint, args.GNN_method, args.dataset, args.dataset_id)
    meta, blob = export_serving(
        args.GNN_method, args.dataset, args.dataset_id, variables,
        batch_size=args.batch_size or None, seq_len=args.seq_len or None,
        precision=args.precision, model_hparams=ckpt_hparams,
        max_rul=args.max_rul)
    save_artifact(args.out, meta, blob)
    print(json.dumps({"artifact": args.out, "bytes": len(blob), **meta}))


if __name__ == "__main__":
    main()
