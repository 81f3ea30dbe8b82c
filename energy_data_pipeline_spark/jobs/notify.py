"""Job-outcome notification hook — SURVEY.md §2.10's side-channel
(notify/slack_notifier.py:15-104, prefect_flows/notify_tasks.py:12-24),
kept as a driver-side callback: it is not a dataflow op, so the engine
only defines the seam. The webhook transport is injectable; absence of a
configured sink is a silent no-op exactly like the reference's
missing-SLACK_WEBHOOK_URL branch (slack_notifier.py:20-23)."""

from __future__ import annotations

import json
import os
import urllib.request
from collections.abc import Callable


def _post_webhook(url: str, payload: dict) -> int:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=10) as resp:  # pragma: no cover
        return resp.status


def notify_job_result(
    job_name: str,
    stats: dict,
    ok: bool = True,
    webhook_url: str | None = None,
    transport: Callable[[str, dict], int] = _post_webhook,
) -> bool:
    """Send a job summary; returns True if a notification went out.

    No configured URL → silent skip. Transport errors are swallowed
    (a failed notification must never fail the job — the reference
    wraps its POST the same way, slack_notifier.py:26-31)."""
    url = webhook_url or os.environ.get("NOTIFY_WEBHOOK_URL")
    if not url:
        return False
    status = "success" if ok else "FAILED"
    payload = {"text": f"[{job_name}] {status}: {json.dumps(stats, default=str)}"}
    try:
        return transport(url, payload) < 300
    except Exception:
        return False
