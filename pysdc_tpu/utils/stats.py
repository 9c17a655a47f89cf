"""Stats filtering/sorting utilities.

Same post-processing surface as the reference ``helpers/stats_helper.py``:
``filter_stats`` (with restart-aware pruning), ``sort_stats``,
``get_list_of_types`` and the one-call ``get_sorted``.
"""

from __future__ import annotations

import numpy as np


def filter_stats(stats, recomputed=None, **kwargs):
    """Extract entries matching the given Entry-field filters; with
    ``recomputed`` set (not None), drop values superseded by restarts."""
    result = {}
    for k, v in stats.items():
        if all(k._asdict().get(k2, None) == v2 for k2, v2 in kwargs.items() if v2 is not None):
            result[k] = v

    if recomputed is not None:
        times_restarted = np.unique([me.time for me in result.keys() if me.num_restarts > 0])
        for t in times_restarted:
            restarts = {}
            stats_now = filter_stats(result, time=t)
            for me in stats_now.keys():
                restarts[me.type] = max(restarts.get(me.type, 0), me.num_restarts)
            for type_, num_restarts_ in restarts.items():
                for i in range(num_restarts_):
                    for you in list(filter_stats(stats_now, type=type_, num_restarts=i).keys()):
                        result.pop(you, None)

        if kwargs.get('type', None) != '_recomputed':
            other_restarted_steps = [
                key for key, val in filter_stats(stats, type='_recomputed', recomputed=False).items() if val
            ]
            for step in other_restarted_steps:
                for me in list(filter_stats(result, time=step.time).keys()):
                    result.pop(me, None)

    return result


def sort_stats(stats, sortby):
    result = [(getattr(k, sortby), v) for k, v in stats.items()]
    return sorted(result, key=lambda tup: tup[0])


def get_list_of_types(stats):
    type_list = []
    for k in stats.keys():
        if k.type not in type_list:
            type_list.append(k.type)
    return type_list


def get_sorted(stats, sortby='time', **kwargs):
    return sort_stats(filter_stats(stats, **kwargs), sortby=sortby)
