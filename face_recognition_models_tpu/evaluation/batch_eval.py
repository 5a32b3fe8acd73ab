"""Batch evaluation over models x benchmarks.

Equivalent of the reference's evaluate_models.py: load each trained model's
best checkpoint, run the 10-fold verification protocol on five benchmarks
(agedb_30, cfp_fp, lfw, calfw, cplfw under <root>/<bench>/{pair.list,imgs}),
and write accuracy/AUC CSV tables (plus XLSX when openpyxl is present —
the reference writes a 2-sheet workbook, evaluate_models.py:108-115).

Unlike the reference (19 full embedding passes per benchmark, SURVEY §3.2),
every unique image is embedded once.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from face_recognition_models_tpu import config as cfg_lib
from face_recognition_models_tpu.data.pairs import benchmark_paths, load_pair_list
from face_recognition_models_tpu.evaluation.verification import (
    VerificationResult,
    embed_unique_images,
    kfold_verification,
    pair_cosine_similarities,
)


def make_embed_fn(model, params, batch_stats, mesh=None):
    """Jitted `embed_fn(uint8 images) -> raw embeddings`.

    With `mesh`, the image batch shards over the mesh's 'data' axis so
    every chip embeds 1/data-th of each batch (the reference evaluates on
    one GPU only, evaluate_models.py:58-64; on a pod this keeps all chips
    busy during the 5-benchmark sweep). Params/stats replicate. The batch
    size must divide by the data-axis size — embed_unique_images pads
    every batch to a fixed size, so pick batch_size as a multiple.
    """
    import jax

    from face_recognition_models_tpu.train.step import make_eval_step

    eval_step = make_eval_step(model)
    if mesh is None:
        jit_step = jax.jit(eval_step)
        return lambda imgs: jit_step(params, batch_stats, imgs)

    from face_recognition_models_tpu.parallel import (
        batch_sharding,
        replicated,
    )
    rep, data_s = replicated(mesh), batch_sharding(mesh)
    jit_step = jax.jit(eval_step, in_shardings=(rep, rep, data_s))
    params = jax.device_put(params, rep)
    batch_stats = jax.device_put(batch_stats, rep)
    n_data = mesh.shape["data"]

    def embed(imgs):
        if imgs.shape[0] % n_data:
            raise ValueError(
                f"batch {imgs.shape[0]} not divisible by mesh data axis "
                f"{n_data}")
        return jit_step(params, batch_stats, imgs)

    return embed


def _load_benchmark_images(pairs: np.ndarray, imgs_dir: str,
                           image_size: int) -> Dict[int, np.ndarray]:
    from PIL import Image
    unique = sorted({int(x) for x in pairs[:, :2].ravel()})
    out = {}
    for img_id in unique:
        path = os.path.join(imgs_dir, f"{img_id}.jpg")
        with Image.open(path) as im:
            im = im.convert("RGB")
            if im.size != (image_size, image_size):
                im = im.resize((image_size, image_size))
            out[img_id] = np.asarray(im, np.uint8)
    return out


def load_benchmark(eval_root: str, benchmark: str, image_size: int = 112
                   ) -> tuple:
    """(pairs [P,3], unique image stack [U,H,W,3], id_to_row dict) for one
    benchmark in either on-disk form: the reference's
    `<root>/<bench>/{pair.list,imgs}` directory layout, or the insightface
    ecosystem's packed `<bench>.bin` (data/pairs.load_bin) — checked in
    that order so an unpacked copy wins when both exist."""
    from face_recognition_models_tpu.data.pairs import bin_path, load_bin

    pairs_file, imgs_dir = benchmark_paths(eval_root, benchmark)
    if os.path.isfile(pairs_file):
        pairs = load_pair_list(pairs_file)
        images_by_id = _load_benchmark_images(pairs, imgs_dir, image_size)
        ids = sorted(images_by_id)
        id_to_row = {i: r for r, i in enumerate(ids)}
        stack = np.stack([images_by_id[i] for i in ids])
        return pairs, stack, id_to_row
    packed = bin_path(eval_root, benchmark)
    if packed is None:
        raise FileNotFoundError(
            f"benchmark '{benchmark}' not found under {eval_root!r}: "
            f"neither {pairs_file} nor a .bin form exists")
    stack, pairs = load_bin(packed, image_size)
    return pairs, stack, {i: i for i in range(len(stack))}


def evaluate_model_on_benchmark(embed_fn, eval_root: str, benchmark: str,
                                image_size: int = 112,
                                batch_size: int = 256,
                                verbose: bool = True,
                                protocol: str = "host",
                                fars: Sequence[float] = (),
                                flip: bool = False):
    """Returns VerificationResult, or (VerificationResult, {far: tpr})
    when `fars` is non-empty (TPR@FAR over the full pair list —
    evaluation/openset.py; beyond the reference's accuracy/AUC).

    protocol: 'host' = the reference's inverted protocol (tune Youden on
    1 fold, test on 9) on the host; 'device' = the same, fully on-chip;
    'standard' = the classic LFW/insightface protocol (sequential folds,
    accuracy-maximizing grid threshold tuned on 9, tested on 1) for
    comparing with published numbers. Pair 'standard' with flip=True to
    match the published convention exactly (flip-sum embeddings)."""
    pairs, stack, id_to_row = load_benchmark(eval_root, benchmark,
                                             image_size)
    emb = embed_unique_images(embed_fn, stack, batch_size, flip=flip)
    sims = pair_cosine_similarities(emb, pairs, id_to_row)
    if protocol == "device":
        from face_recognition_models_tpu.evaluation.device_protocol import (
            kfold_verification_device)
        res = kfold_verification_device(sims, pairs[:, 2])
    elif protocol == "standard":
        from face_recognition_models_tpu.evaluation.verification import (
            standard_kfold_verification)
        res = standard_kfold_verification(sims, pairs[:, 2],
                                          verbose=verbose)
    elif protocol == "host":
        res = kfold_verification(sims, pairs[:, 2], verbose=verbose)
    else:
        raise ValueError(f"unknown protocol {protocol!r} "
                         "(host | device | standard)")
    if not fars:
        return res
    from face_recognition_models_tpu.evaluation.openset import tpr_at_far
    rates = {far: tpr for far, (tpr, _) in
             tpr_at_far(sims, pairs[:, 2], fars).items()}
    return res, rates


def run_batch_evaluation(checkpoint_dir: str, eval_data_path: str,
                         benchmarks: Sequence[str],
                         head: Optional[str] = None,
                         backbone: str = "resnet18",
                         batch_size: int = 256,
                         num_classes: int = cfg_lib.CASIA_NUM_CLASSES,
                         output_dir: str = "evaluation_results",
                         image_size: int = 112,
                         which: str = "final",
                         protocol: str = "host",
                         fars: Sequence[float] = (),
                         flip: bool = False,
                         embed_dim: int = 512) -> int:
    """which: 'final' evaluates the end-of-training snapshot; 'min_loss'
    evaluates the best-by-train-loss checkpoint (the reference's
    evaluate_models.py loads <Name>_min_loss.pth)."""
    import jax

    from face_recognition_models_tpu.checkpoint import restore_backbone
    from face_recognition_models_tpu.models import get_backbone

    # DP the embedding passes over every available chip (mesh data axis).
    mesh = None
    if jax.device_count() > 1:
        from face_recognition_models_tpu.parallel import make_mesh
        mesh = make_mesh(cfg_lib.MeshConfig(data=jax.device_count(),
                                            model=1))
        if batch_size % jax.device_count():
            batch_size += jax.device_count() - batch_size % jax.device_count()
            print(f"[mesh] rounded eval batch to {batch_size} "
                  f"({jax.device_count()} devices)")

    if head is not None:
        model_names = [head]
    else:
        if not os.path.isdir(checkpoint_dir):
            print(f"error: checkpoint dir not found: {checkpoint_dir}")
            return 1
        model_names = sorted(
            d for d in os.listdir(checkpoint_dir)
            if os.path.isdir(os.path.join(checkpoint_dir, d)))
    if not model_names:
        print(f"No model checkpoints found under {checkpoint_dir}")
        return 1

    model = get_backbone(backbone, embed_dim=embed_dim)
    dummy = np.zeros((1, image_size, image_size, 3), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           dummy, train=False)
    abstract = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}

    acc_rows: List[dict] = []
    auc_rows: List[dict] = []
    for name in model_names:
        try:
            restored = restore_backbone(
                os.path.join(checkpoint_dir, name), abstract, which,
                model_name=name)
        except Exception as e:  # missing checkpoint: warn & skip (ref :44-46)
            print(f"[skip] {name}: could not load checkpoint ({e})")
            continue
        embed_fn = make_embed_fn(model, restored["params"],
                                 restored["batch_stats"], mesh=mesh)
        acc_row, auc_row = {"model": name}, {"model": name}
        for bench in benchmarks:
            try:
                res = evaluate_model_on_benchmark(
                    embed_fn, eval_data_path, bench, image_size, batch_size,
                    protocol=protocol, fars=fars, flip=flip)
            except FileNotFoundError as e:
                print(f"[skip] {name} on {bench}: {e}")
                continue
            rates = {}
            if fars:
                res, rates = res
            print(f"{name} on {bench}: {res}")
            acc_row[bench] = res.mean_accuracy
            acc_row[f"{bench}_std"] = res.std_accuracy
            auc_row[bench] = res.mean_auc
            auc_row[f"{bench}_std"] = res.std_auc
            for far, tpr in rates.items():
                print(f"  {bench} TPR@FAR={far:g}: {tpr * 100:.3f}%")
                acc_row[f"{bench}_tpr@far={far:g}"] = tpr * 100.0
        acc_rows.append(acc_row)
        auc_rows.append(auc_row)

    os.makedirs(output_dir, exist_ok=True)
    _write_tables(acc_rows, auc_rows, output_dir)
    return 0


def _write_tables(acc_rows, auc_rows, output_dir: str):
    import pandas as pd
    acc_df = pd.DataFrame(acc_rows)
    auc_df = pd.DataFrame(auc_rows)
    acc_df.to_csv(os.path.join(output_dir, "accuracy_10fold.csv"),
                  index=False)
    auc_df.to_csv(os.path.join(output_dir, "auc_10fold.csv"), index=False)
    try:
        with pd.ExcelWriter(
                os.path.join(output_dir, "evaluation_10fold.xlsx")) as xl:
            acc_df.to_excel(xl, sheet_name="accuracy", index=False)
            auc_df.to_excel(xl, sheet_name="auc", index=False)
    except (ImportError, ModuleNotFoundError, ValueError):
        print("openpyxl not available — wrote CSVs only")
    print(f"Wrote evaluation tables to {output_dir}/")
