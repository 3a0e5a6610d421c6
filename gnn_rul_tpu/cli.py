"""Command-line entry point.

Mirrors the reference CLI (main.py:8-39):

    python -m gnn_rul_tpu.cli --GNN_method FC_STGNN --dataset CMAPSS \\
        --dataset_id FD001 --data_path Processed_dataset --num_runs 5

Aeroengine methods: ASTGCNN GRU_CM HAGCN ST_Conv STFA RGCNU STAGNN
HierCorrPool LOGO DVGTformer STGNN FC_STGNN (CMAPSS / NCMAPSS).
Bearing methods: ST_GCN SAGCN STNet GAT_LSTM STMSGCN AGCN_TF LOGO_bearing
HierCorrPool_bearing GDAGDL (PHM2012 / XJTU_SY).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native GNN RUL benchmarking")
    p.add_argument("--save_dir", default="experiments_logs")
    p.add_argument("--experiment_description", default="GNN_RUL")
    p.add_argument("--run_description", default="run_1")
    p.add_argument("--GNN_method", default="FC_STGNN")
    p.add_argument("--data_path", default="Processed_dataset")
    p.add_argument("--dataset", default="CMAPSS",
                   choices=["CMAPSS", "NCMAPSS", "PHM2012", "XJTU_SY"])
    p.add_argument("--dataset_id", default="FD001")
    p.add_argument("--bearing_id", default="Testing_bearing_1")
    p.add_argument("--num_runs", type=int, default=1)
    p.add_argument("--device", default="tpu",
                   help="kept for reference-CLI compatibility; placement is "
                        "managed by JAX")
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="save a resumable checkpoint every K epochs (0=final only)")
    p.add_argument("--resume", action="store_true",
                   help="resume each run from its checkpoint if present")
    p.add_argument("--precision", default="fp32", choices=["fp32", "bf16"],
                   help="bf16: compute forward/backward in bfloat16 (MXU "
                        "native) with fp32 master params/optimizer/metrics")
    p.add_argument("--fused", default="auto", choices=["auto", "on", "off"],
                   help="fused Pallas kernels for the dot-graph/GAT hot ops "
                        "(models that support it): auto = measured "
                        "Pallas/XLA dispatch, on = force, off = plain XLA")
    p.add_argument("--mesh", default=None, metavar="data=N,model=M",
                   help="train over a (data, model) device mesh, e.g. "
                        "'data=4,model=2' (default: single device). To test "
                        "without a pod: XLA_FLAGS="
                        "--xla_force_host_platform_device_count=8 "
                        "JAX_PLATFORMS=cpu")
    p.add_argument("--epochs", type=int, default=0,
                   help="override the hparam-bank num_epochs (0 = keep)")
    p.add_argument("--vectorized_runs", action="store_true",
                   help="run all --num_runs seeds as ONE vmapped program "
                        "(fills the chip on latency-bound tiers; "
                        "single-device, incompatible with --mesh/--resume)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of one training epoch "
                        "into DIR (view with tensorboard/xprof)")
    p.add_argument("--eval_torch_checkpoint", default=None, metavar="PT",
                   help="skip training: import a reference checkpoint.pt "
                        "(torch utils.py:111-120 format) via "
                        "gnn_rul_tpu.compat and evaluate it on the test "
                        "set (see MIGRATION.md)")
    return p


def parse_mesh_arg(spec: str):
    """'data=N,model=M' -> jax.sharding.Mesh via parallel.mesh.make_mesh."""
    from .parallel.mesh import make_mesh
    sizes = {"data": 1, "model": 1}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in sizes or not v.strip().isdigit() or int(v) < 1:
            raise ValueError(
                f"bad --mesh component {part!r} (want data=N,model=M)")
        sizes[k] = int(v)
    return make_mesh(n_data=sizes["data"], n_model=sizes["model"])


def main(argv=None):
    args = build_parser().parse_args(argv)

    # Join a multi-process job when the launcher exported GNNRUL_COORDINATOR
    # / GNNRUL_NUM_PROCESSES / GNNRUL_PROCESS_ID (must happen before the
    # first device query). Single-process runs are untouched.
    from .parallel.multihost import initialize_from_env
    distributed = initialize_from_env()

    from .data.loader import load_dataset, resolve_data_path
    from .train.trainer import Trainer

    data_path = resolve_data_path(args.data_path, args.dataset,
                                  args.dataset_id, args.bearing_id)
    data = load_dataset(data_path)
    mesh = parse_mesh_arg(args.mesh) if args.mesh else None
    if distributed and mesh is None:
        # Default multi-process layout: pure data parallelism over every
        # chip in the job.
        from .parallel.mesh import make_mesh
        mesh = make_mesh()

    trainer = Trainer(
        method=args.GNN_method,
        dataset=args.dataset,
        dataset_id=args.dataset_id,
        data=data,
        save_dir=args.save_dir,
        experiment_description=args.experiment_description,
        run_description=args.run_description,
        num_runs=args.num_runs,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
        precision=args.precision,
        fused=args.fused,
        mesh=mesh,
        num_epochs_override=args.epochs or None,
        profile_dir=args.profile,
        vectorized_runs=args.vectorized_runs,
    )
    if args.eval_torch_checkpoint:
        from .compat import import_torch_checkpoint
        variables = import_torch_checkpoint(
            args.eval_torch_checkpoint, args.GNN_method,
            dataset=args.dataset, dataset_id=args.dataset_id)
        return trainer.evaluate_only(variables)
    results = trainer.train()
    return results


if __name__ == "__main__":
    main()
