"""Host ingest-path benchmark: N DataLoader worker threads running the
full training/eval preprocessing chain (native C++ resize/normalize
kernels when built, numpy otherwise) feeding collated batches, with
and without the device prefetch hop.

Answers PERF.md's "Host data path" open question with a measured
scaling curve: can the host feed sustain the fused eval step's frame
rate (the device-resident bench assumption)? Run on an otherwise idle
host:

    python scripts/bench_ingest.py [--samples 256] [--height 720]
        [--device]        # also push batches through prefetch_to_device
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--samples', type=int, default=256)
    parser.add_argument('--batch-size', type=int, default=32)
    parser.add_argument('--height', type=int, default=720)
    parser.add_argument('--width', type=int, default=960)
    parser.add_argument('--workers', type=int, nargs='+',
                        default=[1, 2, 4, 8, 16])
    parser.add_argument('--device', action='store_true',
                        help='also run the loader -> prefetch_to_device '
                             'hop (needs a reachable backend)')
    args = parser.parse_args()

    from nicr_mtsa_tpu.data.loader import DataLoader
    from nicr_mtsa_tpu.data.preprocessing import (
        Compose, FullResCloner, InstanceClearStuffIDs,
        InstanceTargetGenerator, NormalizeDepth, NormalizeRGB,
        PanopticTargetGenerator, Resize, ToDeviceArrays,
    )
    from nicr_mtsa_tpu.native import available as is_native_available
    from nicr_mtsa_tpu.testing.dataset import SyntheticRGBDDataset

    is_thing = tuple(i in (1, 2, 3) for i in range(11))
    pre = Compose([
        InstanceClearStuffIDs(semantic_classes_is_thing=is_thing),
        FullResCloner(('rgb', 'depth', 'semantic', 'instance')),
        Resize(height=480, width=640),
        InstanceTargetGenerator(sigma=8,
                                semantic_classes_is_thing=is_thing),
        PanopticTargetGenerator(semantic_classes_is_thing=is_thing),
        NormalizeRGB(),
        NormalizeDepth(depth_mean=8000.0, depth_std=4000.0,
                       raw_depth=True),
        ToDeviceArrays(),
    ])
    serve_pre = Compose([
        Resize(height=480, width=640),
        NormalizeRGB(),
        NormalizeDepth(depth_mean=8000.0, depth_std=4000.0,
                       raw_depth=True),
        ToDeviceArrays(),
    ])

    # pre-generate RAW samples once so the measurement is the
    # preprocessing chain, not the synthetic-data RNG
    import copy
    raw_ds = SyntheticRGBDDataset(
        n_samples=args.samples, height=args.height, width=args.width)
    raw = [raw_ds[i] for i in range(args.samples)]

    class _Cached:
        def __init__(self, preproc):
            self._p = preproc

        def __len__(self):
            return len(raw)

        def __getitem__(self, i):
            return self._p(copy.deepcopy(raw[i]))

    print(f'native preproc kernels: {is_native_available()}')
    print(f'{args.height}x{args.width} raw -> 480x640, '
          f'batch {args.batch_size}')
    for name, chain in (('serve chain (resize+normalize)', serve_pre),
                        ('full eval-target chain', pre)):
        print(f'-- {name} --')
        print('workers  samples/s  (scaling)')
        base = None
        for n in args.workers:
            loader = DataLoader(_Cached(chain),
                                batch_size=args.batch_size,
                                num_workers=n, prefetch_batches=4)
            t0 = time.perf_counter()
            count = 0
            for batch in loader:
                count += batch['rgb'].shape[0]
            dt = time.perf_counter() - t0
            rate = count / dt
            if base is None:
                base = rate
            print(f'{n:7d}  {rate:9.1f}  ({rate / base:.2f}x)')

    if args.device:
        import jax
        from nicr_mtsa_tpu.data import prefetch_to_device
        n = args.workers[-1]
        loader = DataLoader(_Cached(pre), batch_size=args.batch_size,
                            num_workers=n, prefetch_batches=4)

        def gen():
            for batch in loader:
                yield {'rgb': batch['rgb'], 'depth': batch['depth']}

        t0 = time.perf_counter()
        count = 0
        last = None
        for dev_batch in prefetch_to_device(gen(), size=2):
            count += dev_batch['rgb'].shape[0]
            last = dev_batch
        jax.block_until_ready(last)
        dt = time.perf_counter() - t0
        print(f'loader({n}) -> prefetch_to_device: {count / dt:.1f} '
              f'samples/s')


if __name__ == '__main__':
    main()
