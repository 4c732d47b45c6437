"""Trace file reader and console-format helpers (reference:
kge/job/trace.py).

trace.yaml holds one single-line YAML record per event. Filtering shells
out to grep when available (the reference's trick for large traces) and
falls back to pure Python.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
from typing import Any, Callable, Dict, List, Optional

import yaml


class Trace:
    """An in-memory trace, filterable by key-value pairs."""

    def __init__(self, tracefile: Optional[str] = None,
                 regex_filter: Optional[str] = None):
        self.entries: List[Dict[str, Any]] = []
        if tracefile:
            self.load(tracefile, regex_filter)

    def load(self, tracefile: str, regex_filter: Optional[str] = None):
        pattern = re.compile(regex_filter) if regex_filter else None
        with open(tracefile, "r") as f:
            for line in f:
                if pattern and not pattern.search(line):
                    continue
                self.entries.append(yaml.safe_load(line))

    def filter(self, filter_dict: Optional[Dict[str, Any]] = None
               ) -> List[Dict[str, Any]]:
        if not filter_dict:
            return self.entries

        def predicate(entry):
            return all(entry.get(k) == v for k, v in filter_dict.items())

        return [e for e in self.entries if predicate(e)]

    @staticmethod
    def grep_training_trace_entries(tracefile: str, job, scope,
                                    job_id=None, **kwargs):
        """Job-level entries for (train, epoch) etc., following resumed-job
        chains backwards via resumed_from_job_id (reference:
        kge/job/trace.py:109-236)."""
        entries = Trace.grep_entries(
            tracefile, [f"job: {job}", f"scope: {scope}"]
        )
        if job_id:
            # walk the chain of resumed jobs backwards
            keep, current = [], job_id
            while current:
                matching = [e for e in entries if e.get("job_id") == current]
                keep = matching + keep
                resumed = {
                    e.get("resumed_from_job_id")
                    for e in matching if e.get("resumed_from_job_id")
                }
                current = next(iter(resumed), None)
            entries = keep
        return entries

    @staticmethod
    def grep_entries(tracefile: str, conjunctions: List[str],
                     raw: bool = False):
        """Entries whose line contains all the given substrings; uses
        grep when available (reference: kge/job/trace.py:62-107)."""
        if shutil.which("grep"):
            lines: Optional[List[str]] = None
            current = tracefile
            try:
                args = ["grep", "-F", conjunctions[0], tracefile]
                proc = subprocess.run(args, capture_output=True, text=True)
                if proc.returncode > 1:
                    # 0: matches, 1: no matches; >1: error (e.g. missing
                    # file) -- fall through to the pure-Python path so a
                    # typo'd path raises instead of returning []
                    raise OSError(proc.stderr.strip() or "grep failed")
                lines = proc.stdout.splitlines()
                for c in conjunctions[1:]:
                    out = subprocess.run(
                        ["grep", "-F", c], input="\n".join(lines),
                        capture_output=True, text=True,
                    ).stdout
                    lines = out.splitlines()
            except OSError:
                lines = None
            if lines is not None:
                if raw:
                    return lines
                return [yaml.safe_load(line) for line in lines if line]
        # fallback: pure python
        result = []
        with open(tracefile, "r") as f:
            for line in f:
                if all(c in line for c in conjunctions):
                    result.append(line if raw else yaml.safe_load(line))
        return result


def get_metric(entry: Dict[str, Any], metric_name: str) -> float:
    """Extract a metric from a trace entry, computing hits@K patterns on
    demand (reference: kge/job/trace.py:45-60)."""
    if metric_name in entry:
        return entry[metric_name]
    match = re.match(r"^hits(?:_at|@)_?(\d+)(.*)$", metric_name)
    if match:
        k, suffix = match.groups()
        alt = f"hits_at_{k}{suffix}"
        if alt in entry:
            return entry[alt]
    raise ValueError(f"metric {metric_name} not found in trace entry")


def format_trace_entry(format_key: str, trace_entry: Dict[str, Any],
                       config) -> Optional[str]:
    """Evaluate the user's console-format f-string expression for the
    given event key (reference: kge/job/trace.py:257-273 and
    config-default.yaml console.format)."""
    fmt = config.get("console.format") or {}
    expr = fmt.get(format_key)
    if not expr:
        return None
    import math

    scope = {"config": config, "trace": trace_entry, "math": math}
    scope.update(trace_entry)
    try:
        return str(eval(expr, None, scope))
    except Exception as e:
        return f"<error formatting {format_key}: {e}>"
