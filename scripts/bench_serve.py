"""Measure the `face serve` micro-batching stack on the real device.

Spawns K client threads hammering EmbedService.batcher.submit() (the
exact path HTTP requests take, minus socket framing) and reports
steady-state images/s plus client-side latency percentiles.

NOTE (this sandbox): every micro-batch is one dispatch + one value fetch
through the remote-TPU tunnel, so the per-request latency here is
tunnel-RTT-bound, not device-bound (PERF.md "Serving latency" measured
the device forward at 0.67-0.72 ms for b=1..8). On local-PCIe hosts the
dispatch overhead is ~100x smaller. Throughput still shows the batching
effect: one config per process (CLAUDE.md timing discipline).

Usage: python scripts/bench_serve.py [--micro-batch 8] [--clients 32]
       [--seconds 10] [--backbone resnet50] [--image-size 112]
"""

import argparse
import threading
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro-batch", type=int, default=8)
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--image-size", type=int, default=112)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.serving.server import EmbedService
    from face_recognition_models_tpu.train.step import make_eval_step

    model = get_backbone(args.backbone)
    s = args.image_size
    dummy = np.zeros((1, s, s, 3), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           dummy, train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    eval_step = jax.jit(make_eval_step(model))
    embed_fn = lambda im: eval_step(params, stats, im)

    t0 = time.monotonic()
    service = EmbedService(embed_fn, s, batch_size=args.micro_batch,
                           max_wait_ms=args.max_wait_ms)
    print(f"compiled in {time.monotonic() - t0:.1f}s", flush=True)
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (s, s, 3), dtype=np.uint8)

    # warmup: fill the pipeline, trigger nothing new to compile
    for _ in range(4):
        service.batcher.submit(img)
    print("warm", flush=True)

    stop = time.monotonic() + args.seconds
    counts = [0] * args.clients
    lats: list = [[] for _ in range(args.clients)]

    def client(i):
        while time.monotonic() < stop:
            t0 = time.monotonic()
            service.batcher.submit(img)
            lats[i].append(time.monotonic() - t0)
            counts[i] += 1

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t_start = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t_start

    total = sum(counts)
    lat = np.concatenate([np.asarray(x) for x in lats if x]) * 1e3
    st = service.batcher.stats()
    service.close()
    print(f"backbone={args.backbone} micro_batch={args.micro_batch} "
          f"clients={args.clients} wait={args.max_wait_ms}ms")
    print(f"throughput: {total / wall:.1f} img/s over {wall:.1f}s "
          f"({total} requests)")
    print(f"latency ms: p50 {np.percentile(lat, 50):.2f}  "
          f"p95 {np.percentile(lat, 95):.2f}  p99 "
          f"{np.percentile(lat, 99):.2f}")
    print(f"batcher: {st['batches']} batches, mean fill "
          f"{st['images'] / max(st['batches'], 1):.2f}/{st['batch_size']}, "
          f"max {st['max_coalesced']}")


if __name__ == "__main__":
    main()
