"""Checkpoint policy: which validation metrics trigger a checkpoint.

Framework-agnostic policy class with the same semantics as the
reference CheckpointHelper (checkpointing.py:11-150):

- metric shorthands ('miou', 'bacc', 'miou+bacc') are lazily matched
  against validation log keys on the first epoch (substring match over
  keys containing 'valid' and not 'best'; ambiguity is an error),
- direction is inferred from the name (miou/acc/rq/sq/pq: higher is
  better; mae/rmse/loss: lower is better),
- combined metrics ('a+b') sum their matched log values.

Checkpoint *format* is handled separately by orbax-style pytree
checkpoints (see parallel/checkpoint.py).
"""
from typing import Any, Dict, Optional, Sequence, Tuple

from copy import deepcopy


_LARGER_IS_BETTER = ('miou', 'acc', 'rq', 'sq', 'pq')
_SMALLER_IS_BETTER = ('mae', 'rmse', 'loss')


class CheckpointHelper:
    def __init__(
        self,
        metric_names: Optional[Sequence[str]] = None,
        debug: bool = True,
    ) -> None:
        if metric_names is None:
            self._metric_mapping = None
        else:
            self._metric_mapping = {name: [] for name in metric_names}
        self._metrics_determined = False
        self._debug = debug
        self._cache_bests: Dict[str, Any] = {}

    @property
    def metric_mapping(self) -> Optional[Dict[str, Tuple[str, ...]]]:
        return self._metric_mapping

    @property
    def metric_mapping_joined(self) -> Dict[str, str]:
        if self._metric_mapping is None:
            return {}
        return {n: '+'.join(ms) for n, ms in self._metric_mapping.items()}

    @staticmethod
    def _determine_checkpoint_metrics(
        to_search_for: str,
        logs: Dict[str, Any],
    ) -> Tuple[str, ...]:
        matched = []
        for m in to_search_for.split('+'):
            candidates = [
                key for key in logs
                if 'best' not in key and 'valid' in key and m in key
            ]
            if len(candidates) == 0:
                raise ValueError(
                    f"No suitable metric found for '{m}'. "
                    f"Available keys for matching: {list(logs.keys())}"
                )
            if len(candidates) > 1:
                raise ValueError(
                    f"Multiple suitable metrics: '{candidates}' for "
                    f"'{m}' found."
                )
            matched.append(candidates[0])
        return tuple(matched)

    @staticmethod
    def _is_new_better(metric: str, new_value, old_value) -> bool:
        larger = any(s in metric for s in _LARGER_IS_BETTER)
        smaller = any(s in metric for s in _SMALLER_IS_BETTER)

        if not (larger ^ smaller):
            raise ValueError(
                f"Cannot determine better value for '{metric}' "
                f"(new: '{new_value}' '>' vs. '<' old: '{old_value}')."
            )
        if old_value is None:
            return True
        return new_value > old_value if larger else new_value < old_value

    def check_for_checkpoint(
        self,
        logs: Dict[str, Any],
        add_checkpoint_metrics_to_logs: bool = True,
    ) -> Dict[str, bool]:
        """Return {metric_name: True} for metrics that hit a new best."""
        if self._metric_mapping is None:
            return {}

        if not self._metrics_determined:
            for name in self._metric_mapping:
                self._metric_mapping[name] = \
                    self._determine_checkpoint_metrics(name, logs)
            if self._debug:
                print(f"Using '{self._metric_mapping}' for checkpointing.")
            self._metrics_determined = True

        do_create_checkpoint = {}
        for name, metrics in self._metric_mapping.items():
            old_value = self._cache_bests.get(name, None)

            new_value = logs[metrics[0]]
            assert len(metrics) == 1 or (len(metrics) > 1 and '+' in name)
            for m in metrics[1:]:
                new_value = new_value + logs[m]

            if self._is_new_better(name, new_value, old_value):
                if self._debug:
                    print(f"Checkpoint metric '{name}: {metrics}' reached "
                          f"new best value! (new: '{new_value}', old: "
                          f"'{old_value}')")
                self._cache_bests[name] = new_value
                do_create_checkpoint[name] = True

            if add_checkpoint_metrics_to_logs:
                full_name = self.metric_mapping_joined[name]
                logs[f'ckpt_{full_name}'] = deepcopy(new_value)

        return do_create_checkpoint
