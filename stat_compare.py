"""Frechet distance between two feature-statistics files.

Capability parity with /root/reference/stat_compare.py (TTUR-style FID):
d^2 = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)), with eps-regularised sqrtm
fallback and an imaginary-component sanity check.
"""

import argparse

import numpy as np
from scipy import linalg


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    assert mu1.shape == mu2.shape, "mean vectors differ in length"
    assert sigma1.shape == sigma2.shape, "covariances differ in shape"

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        print(
            f"sqrtm produced a singular product; regularising with eps={eps}"
        )
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))

    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"imaginary component {np.max(np.abs(covmean.imag))}"
            )
        covmean = covmean.real

    return (
        diff.dot(diff)
        + np.trace(sigma1)
        + np.trace(sigma2)
        - 2 * np.trace(covmean)
    )


def main():
    args = arg_parser().parse_args()
    stat1 = np.load(args.stat_1)
    stat2 = np.load(args.stat_2)
    print(
        frechet_distance(
            stat1["mean"], stat1["cov"], stat2["mean"], stat2["cov"]
        )
    )


def arg_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("stat_1", type=str)
    parser.add_argument("stat_2", type=str)
    return parser


if __name__ == "__main__":
    main()
