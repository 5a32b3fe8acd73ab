"""End-to-end production walkthrough on synthetic data — every stage a
deployment actually runs, chained through the same `face` CLI entry
points (no real dataset needed):

  1. train   — margin-head training with in-training verification
               (--eval-every) and a best-by-verification artifact
  2. export  — self-contained StableHLO serving artifact
  3. embed   — batch-embed a gallery tree to .npz (with quality scores)
  4. identify— 1:N identification probes-vs-gallery
  5. serve   — online HTTP micro-batching service (health + one request)

Usage (CPU is fine for the demo sizes):
    python examples/production_pipeline.py [--workdir /tmp/face_demo]
"""

import argparse
import json
import os
import shutil
import sys
import threading
import urllib.request


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/face_pipeline_demo")
    ap.add_argument("--image-size", type=int, default=32)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("FACE_DEMO_PLATFORM", "cpu"))

    import numpy as np

    from face_recognition_models_tpu.cli.main import main as face
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities,
        write_identity_tree,
        write_pair_benchmark,
    )

    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd)
    s = args.image_size

    # --- data: a synthetic identity tree + a pair benchmark ---------------
    images, labels = synthetic_identities(args.classes, 10, image_size=s,
                                          seed=0, noise=12.0)
    gallery_dir = os.path.join(wd, "gallery")
    probe_dir = os.path.join(wd, "probes")
    # gallery = first 8 copies per identity, probes = the remaining 2
    keep = np.concatenate([np.flatnonzero(labels == c)[:8]
                           for c in range(args.classes)])
    probe = np.concatenate([np.flatnonzero(labels == c)[8:]
                            for c in range(args.classes)])
    write_identity_tree(gallery_dir, images[keep], labels[keep], split="")
    write_identity_tree(probe_dir, images[probe], labels[probe], split="")
    write_pair_benchmark(os.path.join(wd, "bench", "lfw"),
                         num_classes=4, pairs_per_kind=12, image_size=s)

    # --- 1. train with in-training verification ---------------------------
    print("\n=== 1. face train (--eval-every) ===")
    assert face([
        "train", "--synthetic", "--synthetic-classes", str(args.classes),
        "--synthetic-per-class", "16", "--image-size", str(s),
        "-bs", "16", "-e", str(args.epochs), "-lr", "0.02",
        "--head", "arcface", "--working-path", wd,
        "--eval-every", "1", "--eval-data-path", os.path.join(wd, "bench"),
        "--benchmarks", "lfw", "--print_freq", "1000"]) == 0
    ckpt = os.path.join(wd, "checkpoints", "arcface")

    # --- 2. export a serving artifact --------------------------------------
    print("\n=== 2. face export ===")
    artifact = os.path.join(wd, "embedder.frte")
    assert face(["export", "--checkpoint-dir", ckpt,
                 "--backbone", "resnet18", "--which", "best_acc",
                 "--image-size", str(s), "--output", artifact]) == 0

    # --- 3. embed gallery + probes -----------------------------------------
    print("\n=== 3. face embed ===")
    gal_npz = os.path.join(wd, "gallery.npz")
    probe_npz = os.path.join(wd, "probes.npz")
    for src, dst in ((gallery_dir, gal_npz), (probe_dir, probe_npz)):
        assert face(["embed", "--input", src, "--output", dst,
                     "--model", artifact, "--batch-size", "32",
                     "--num-workers", "2"]) == 0

    # --- 4. 1:N identification ---------------------------------------------
    print("\n=== 4. face identify ===")
    assert face(["identify", "--gallery", gal_npz, "--probes", probe_npz,
                 "--ranks", "1,5"]) == 0

    # --- 5. online serving --------------------------------------------------
    print("\n=== 5. face serve (one request) ===")
    from face_recognition_models_tpu.serving.export import load_embedder
    from face_recognition_models_tpu.serving.server import (
        EmbedService,
        make_server,
    )
    art = load_embedder(artifact)
    service = EmbedService(art.fn, art.image_size, batch_size=4,
                           max_wait_ms=2.0, gallery_path=gal_npz)
    server = make_server(service, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    probe_img = sorted(os.path.join(r, f) for r, _, fs in os.walk(probe_dir)
                       for f in fs)[0]
    req = urllib.request.Request(url + "/identify?top_k=3",
                                 data=open(probe_img, "rb").read(),
                                 method="POST")
    out = json.loads(urllib.request.urlopen(req, timeout=60).read())
    print(f"probe {os.path.relpath(probe_img, wd)} -> top match "
          f"{out['matches'][0]['path']} (score "
          f"{out['matches'][0]['score']:.4f}, quality "
          f"{out['quality']:.3f})")
    server.shutdown()
    service.close()
    print("\npipeline complete:", wd)
    return 0


if __name__ == "__main__":
    sys.exit(main())
