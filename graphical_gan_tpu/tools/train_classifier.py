"""Train and save the hermetic metric classifier.

Completes the zero-egress sample-quality story: train the in-framework
``MetricClassifier`` supervised on a labeled dataset, save its params, and
feed the checkpoint to ``tools.score_samples --classifier jax`` (IS) or
``metrics.fid`` (features) so every comparison uses one shared instrument.

    python -m graphical_gan_tpu.tools.train_classifier \
        --dataset cifar10 --steps 3000 --out clf_cifar10.npz
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import jax


def load_arrays(dataset: str, data_dir):
    from graphical_gan_tpu import data
    if dataset == "cifar10":
        train, test = data.cifar10.load(256, data_dir)
    elif dataset == "svhn":
        train, test = data.svhn.load(256, data_dir or "/tmp/svhn")
    elif dataset == "mnist":
        tr, dv, te = data.mnist.load(256, 256)
        train, test = tr, te
    else:
        raise ValueError(dataset)

    def collect(factory, limit=None):
        xs, ys = [], []
        n = 0
        for x, y in factory():
            xs.append(np.asarray(x))
            ys.append(np.asarray(y))
            n += len(x)
            if limit and n >= limit:
                break
        return np.concatenate(xs), np.concatenate(ys)

    return collect(train), collect(test, limit=10000)


def spec_for(dataset: str):
    from graphical_gan_tpu.core.config import dataset_spec
    d = dataset_spec(dataset)
    return d.image_hw, d.channels


def main(argv=None):
    from graphical_gan_tpu.metrics.jax_classifier import MetricClassifier
    from graphical_gan_tpu.train import checkpoint

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="cifar10",
                   choices=["cifar10", "svhn", "mnist"])
    p.add_argument("--data-dir", default=None)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="metric_classifier.npz")
    args = p.parse_args(argv)

    (train_x, train_y), (test_x, test_y) = load_arrays(args.dataset,
                                                       args.data_dir)
    image_hw, channels = spec_for(args.dataset)
    # mnist arrives as floats in [0,1]; the classifier consumes [0,255]
    if train_x.dtype != np.int32 and train_x.max() <= 1.5:
        train_x = (train_x * 255).astype(np.int32)
        test_x = (test_x * 255).astype(np.int32)

    clf = MetricClassifier(image_hw=image_hw, channels=channels,
                           n_classes=int(train_y.max()) + 1, dim=args.dim)
    params = clf.fit(train_x.astype(np.int32), train_y, steps=args.steps,
                     batch_size=args.batch_size, lr=args.lr, seed=args.seed,
                     log_every=max(1, args.steps // 10))
    acc = clf.accuracy(params, test_x.astype(np.int32), test_y)
    checkpoint.save(args.out, params,
                    extra={"dataset": args.dataset, "dim": args.dim,
                           "test_accuracy": acc})
    print(json.dumps({"out": args.out, "test_accuracy": round(acc, 4),
                      "dataset": args.dataset, "dim": args.dim}))


if __name__ == "__main__":
    main()
