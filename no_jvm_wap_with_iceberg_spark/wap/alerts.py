"""Alert channels for audit failures — reference U3 parity.

The reference posts to Slack when an audit fails and silently no-ops
when the webhook env var is absent (``send_slack_alert``,
``src/serverless/app.py:61-96``, no-op at :76-78). Same contract
here: ``webhook_alert_from_env`` builds an alert function for
``WapPipeline(alert=...)`` that formats the failure (table, branch,
failed checks — the branch name is the forensic handle, just like the
reference's message tells the reader which branch to inspect) and
POSTs it as JSON; with no env var configured it degrades to a logged
no-op, so pipelines never fail because alerting is unconfigured.
"""

from __future__ import annotations

import json
import os
import urllib.request

from no_jvm_wap_with_iceberg_spark.wap.checks import CheckResult

WEBHOOK_ENV = "WAP_ALERT_WEBHOOK_URL"


def format_alert(table: str, branch: str, results: list[CheckResult]) -> str:
    """Human-readable failure summary (the reference's message shape:
    what failed, and which branch holds the quarantined data)."""
    failed = [r.check for r in results if not r.passed]
    return (
        f"WAP audit failed for table '{table}': {failed}. "
        f"Branch '{branch}' is left open for forensics."
    )


def post_webhook(url: str, text: str, timeout: float = 5.0) -> bool:
    """POST ``{"text": ...}`` to a webhook (Slack-compatible payload)."""
    req = urllib.request.Request(
        url,
        data=json.dumps({"text": text}).encode("utf-8"),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return 200 <= resp.status < 300
    except Exception:
        return False  # alerting must never take the pipeline down


def webhook_alert_from_env(table: str, env_var: str = WEBHOOK_ENV):
    """Alert function for ``WapPipeline(alert=...)``; no-op (print)
    when ``env_var`` is unset — mirroring the reference's behavior."""

    def _alert(branch: str, results: list[CheckResult]) -> None:
        text = format_alert(table, branch, results)
        url = os.environ.get(env_var)
        if not url:
            print(f"[wap-alert] {text}")
            return
        post_webhook(url, text)

    return _alert
