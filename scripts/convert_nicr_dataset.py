"""Convert a prepared nicr-scene-analysis-datasets dataset into the
directory layout consumed by nicr_mtsa_tpu.data.dataset (layout doc in
that module). Requires the external `nicr-scene-analysis-datasets`
package (NOT a dependency of this repo; reference README.md:119-121)
and a dataset already prepared with its tooling.

Usage:
  python scripts/convert_nicr_dataset.py nyuv2 /path/to/nyuv2 out/ \
      --splits train test [--max-samples N]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from nicr_mtsa_tpu.data.dataset import (                       # noqa: E402
    DatasetConfig, SemanticLabel, SemanticLabelList,
    write_directory_dataset,
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('name', help='dataset name (e.g. nyuv2)')
    parser.add_argument('dataset_path')
    parser.add_argument('out')
    parser.add_argument('--splits', nargs='+', default=['train', 'test'])
    parser.add_argument('--max-samples', type=int, default=0)
    parser.add_argument('--sample-keys', nargs='+',
                        default=['rgb', 'depth', 'semantic', 'instance',
                                 'orientations', 'scene'])
    args = parser.parse_args()

    try:
        import nicr_scene_analysis_datasets as nsad
    except ImportError:
        sys.exit('nicr-scene-analysis-datasets is not installed; '
                 'install it (reference README.md:119-121) to convert '
                 'prepared datasets')

    Dataset = nsad.get_dataset_class(args.name)

    first = Dataset(dataset_path=args.dataset_path,
                    split=args.splits[0],
                    sample_keys=tuple(args.sample_keys))
    sll = first.config.semantic_label_list
    labels = SemanticLabelList(
        SemanticLabel(
            name=str(l.class_name),
            is_thing=bool(l.is_thing),
            use_orientation=bool(getattr(l, 'use_orientations', False)),
            color=tuple(int(c) for c in l.color),
        ) for l in sll)
    scene_names = tuple(
        str(n) for n in getattr(first.config, 'scene_label_list', ()))
    depth_stats = getattr(first, 'depth_compute_stats',
                          lambda: None)() or {}
    config = DatasetConfig(
        semantic_label_list=labels,
        scene_label_list=scene_names,
        depth_mean=float(getattr(depth_stats, 'mean',
                                 depth_stats.get('mean', 0.0)
                                 if isinstance(depth_stats, dict)
                                 else 0.0)),
        depth_std=float(getattr(depth_stats, 'std',
                                depth_stats.get('std', 1.0)
                                if isinstance(depth_stats, dict)
                                else 1.0)),
        depth_mode=str(getattr(first.config, 'depth_mode', 'raw')),
    )

    for split in args.splits:
        ds = Dataset(dataset_path=args.dataset_path, split=split,
                     sample_keys=tuple(args.sample_keys))
        n = len(ds)
        if args.max_samples:
            n = min(n, args.max_samples)

        def samples():
            for i in range(n):
                s = dict(ds[i])
                s.setdefault('identifier', (split, f'{i:06d}'))
                if 'semantic' in s:
                    s['semantic'] = np.asarray(s['semantic'])
                if 'instance' in s:
                    s['instance'] = np.asarray(
                        s['instance']).astype(np.uint16)
                yield s

        write_directory_dataset(args.out, split, list(samples()), config)
        print(f'{split}: wrote {n} samples')


if __name__ == '__main__':
    main()
