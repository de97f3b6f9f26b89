"""Terminal chat client — the CLI counterpart of the browser UI.

The reference ships a Streamlit chat frontend (/root/reference/
frontend.py); this stack serves an equivalent browser UI at GET /
(financial_rag_system_tpu/serving/ui.py) and this script provides the
same surface for terminals/scripts: health badge, fixed default ticker
AAPL, top_k option, 95 s request timeout, sigmoid-normalized source
score bars, and in-session history.

Usage: python frontend.py [--backend URL] [--ticker AAPL] [--top-k 5]
"""

from __future__ import annotations

import argparse
import math

import requests

from financial_rag_system_tpu.utils.config import default_backend_url


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


def bar(p: float, width: int = 24) -> str:
    n = int(round(p * width))
    return "█" * n + "░" * (width - n)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None,
                help="backend URL (default: BACKEND_URL env or DNS probe)")
    ap.add_argument("--ticker", default="AAPL")
    ap.add_argument("--top-k", type=int, default=5)
    args = ap.parse_args()
    if args.backend is None:
        args.backend = default_backend_url()

    try:
        r = requests.get(f"{args.backend}/ready", timeout=5).json()
        status = r.get("status")
        chunks = r.get("indexed_chunks", "?")
        print(f"backend: {status} ({chunks} chunks indexed)")
    except requests.RequestException as exc:
        print(f"backend offline: {exc}")
        return

    print(f"ticker={args.ticker} top_k={args.top_k} — empty line to quit\n")
    history: list[tuple[str, str]] = []
    while True:
        try:
            query = input(f"[{args.ticker}]> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not query:
            break
        try:
            resp = requests.post(
                f"{args.backend}/ask",
                json={"query": query, "ticker": args.ticker, "top_k": args.top_k},
                timeout=95,
            ).json()
        except requests.RequestException as exc:
            print(f"⚠️ request failed: {exc}")
            continue
        answer = resp.get("answer", "")
        provider = resp.get("provider", "?")
        cached = " · cached" if resp.get("cached") else ""
        print(f"\n{answer}\n  — {provider}{cached}")
        for s in resp.get("sources", []):
            p = sigmoid(float(s.get("score", 0.0)))
            print(f"  {bar(p)} [{s.get('document_type','?')}] "
                  f"{s.get('text','')[:90]}")
        print()
        history.append((query, answer))


if __name__ == "__main__":
    main()
