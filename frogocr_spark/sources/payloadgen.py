"""Deterministic synthetic transcript generator (FIXTURES.md §1–2).

Everything is a pure function of ``(conv, turn)`` via md5 — no RNG state,
no wall clock — so the same rows can be produced independently on any
executor (Spark generation) and on the driver (pytest oracle), and the
oracle byte-equality contract holds across runs and partitionings.

The producer analog of FrogOCR's ``frog add`` (enumerate inputs → derive
outputs → insert tasks — reference ``Source/Application.cpp:121-264``).

Table shape is exactly BASELINE.json ``input_hint``:
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)``; ``ts`` = 2026-01-01T00:00:00Z + turn_idx minutes.
"""

from __future__ import annotations

import datetime as dt
import hashlib

EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)

_VOCAB = (
    "archive record ledger folio census parish survey deed charter manifest "
    "register scan batch index quorum page margin gutter column row field "
    "entry stamp seal notary clerk scribe vellum paper ink quill press type "
    "font glyph stroke serif baseline kerning layout block line word symbol "
    "north south east west harbor fjord valley ridge meadow forest"
).split()

_TOOLS = ("browser", "pdf_reader", "shell", "")

# weighted payload-class wheel (plain-heavy, like real transcripts)
_CLASS_WHEEL = (
    "plain", "plain", "plain", "markdown", "html",
    "pdf_layout", "tool_json", "two_pass",
)


def _h(conv: int, turn: int, salt: str = "") -> int:
    digest = hashlib.md5(f"{conv}:{turn}:{salt}".encode()).digest()
    return int.from_bytes(digest[:8], "big")


def _words(conv: int, turn: int, salt: str, n: int) -> list[str]:
    base = _h(conv, turn, salt)
    return [_VOCAB[(base + 31 * i) % len(_VOCAB)] for i in range(n)]


def _sentence(conv: int, turn: int, salt: str, n: int) -> str:
    return " ".join(_words(conv, turn, salt, n))


def turns_in_conv(conv: int, skew_conv_turns: int = 0) -> int:
    """Deterministic turns-per-conversation: 2..16, median ≈ 8.
    ``conv == 0`` gets ``skew_conv_turns`` when set (skew fixture)."""
    if conv == 0 and skew_conv_turns:
        return skew_conv_turns
    return 2 + _h(conv, -1, "nturns") % 15


def role_of(conv: int, turn: int) -> str:
    if turn == 0:
        return "user"
    r = _h(conv, turn, "role") % 4
    return ("assistant", "user", "tool", "assistant")[r]


def payload_class(conv: int, turn: int) -> str:
    role = role_of(conv, turn)
    if role == "tool":
        return "tool_json"
    return _CLASS_WHEEL[_h(conv, turn, "class") % len(_CLASS_WHEEL)]


def _gen_plain(conv: int, turn: int) -> str:
    h = _h(conv, turn, "plain")
    if h % 37 == 0:
        return "   "  # whitespace-only → empty_after_strip fixture
    n = 8 + h % 40
    pad = " " * (h % 3)
    return pad + _sentence(conv, turn, "pw", n) + pad


def _gen_markdown(conv: int, turn: int) -> str:
    h = _h(conv, turn, "md")
    w = _words(conv, turn, "mw", 14)
    lines = [
        f"## {w[0]} {w[1]}",
        f"{w[2]} **{w[3]}** and [{w[4]}](https://example.org/{w[5]}) {w[6]}.",
        f"- {w[7]} `{w[8]}`",
        f"> {w[9]} {w[10]}",
    ]
    if h % 2 == 0:
        lines += ["```", f"{w[11]} = {w[12]}({w[13]!r})", "```"]
    return "\n".join(lines)


def _gen_html(conv: int, turn: int) -> str:
    w = _words(conv, turn, "hw", 30)
    nav_links = " ".join(f'<a href="/{x}">{x}</a>' for x in w[:4])
    para1 = " ".join(w[4:16])
    para2 = " ".join(w[16:24])
    aside = " ".join(f'<a href="#{x}">{x}</a>' for x in w[24:27])
    return (
        f"<html><header><h1>{w[27]}</h1></header>"
        f"<nav>{nav_links}</nav>"
        f"<article><p>{para1}.</p><p>{para2}.</p></article>"
        f"<aside>{aside}</aside>"
        f"<footer>{w[28]} {w[29]} 2026</footer></html>"
    )


def _gen_pdf_layout(conv: int, turn: int) -> str:
    """Two-column page with running header/footer; tokens emitted in a
    deterministic shuffled order (exercises reading-order recovery)."""
    w = _words(conv, turn, "lw", 16)
    toks: list[str] = [f"@400,20,80,12|HEADER-{conv % 97}", f"@400,780,60,10|p{turn}"]
    for i in range(6):  # left column x=60, right column x=420
        y = 100 + 90 * i
        toks.append(f"@60,{y},140,14|{w[i]}")
        toks.append(f"@64,{y + 4},120,14|{w[i + 6]}")  # same band, larger x
    for i in range(4):
        toks.append(f"@420,{100 + 160 * i},140,14|{w[12 + i % 4]}")
    toks.append("@10,400,2,2|dust")  # sub-MIN_SIDE box → F5-filtered
    order = sorted(range(len(toks)), key=lambda i: _h(conv, turn, f"shuf{i}"))
    return " ".join(toks[i] for i in order)


def _gen_tool_json(conv: int, turn: int) -> str:
    h = _h(conv, turn, "tj")
    content = _sentence(conv, turn, "tc", 6 + h % 12)
    if h % 23 == 0:
        return '{"status": "error", "content": "' + content  # truncated → parse failure
    if h % 11 == 0:
        return '{"status": "ok", "exit_code": 0}'  # no content field
    key = ("content", "text", "output", "stdout")[h % 4]
    return ('{"status": "ok", "' + key + '": "' + content
            + '", "elapsed_ms": ' + str(h % 5000) + "}")


def _gen_two_pass(conv: int, turn: int) -> str:
    h = _h(conv, turn, "tp")
    pre = _sentence(conv, turn, "t1", 5 + h % 6)
    mid = _sentence(conv, turn, "t2", 3 + h % 4)
    post = _sentence(conv, turn, "t3", 4 + h % 5)
    region1 = _sentence(conv, turn, "r1", 3)
    if h % 5 == 0:
        region1 += " wh?t"  # hard region ('?') → SECONDPASS_HARD_CONF
    parts = [pre, "[[LOWCONF]]" + region1[::-1] + "[[/LOWCONF]]", mid]
    if h % 3 == 0:
        region2 = _sentence(conv, turn, "r2", 2)
        parts += ["[[LOWCONF]]" + region2[::-1] + "[[/LOWCONF]]"]
    parts.append(post)
    return " ".join(parts)


_GENERATORS = {
    "plain": _gen_plain,
    "markdown": _gen_markdown,
    "html": _gen_html,
    "pdf_layout": _gen_pdf_layout,
    "tool_json": _gen_tool_json,
    "two_pass": _gen_two_pass,
}


def gen_turn(conv: int, turn: int) -> dict:
    """One transcript row (pure function of (conv, turn))."""
    cls = payload_class(conv, turn)
    role = role_of(conv, turn)
    if cls == "tool_json" and role != "tool":
        role = "tool"
    tool = _TOOLS[_h(conv, turn, "tool") % 3] if role == "tool" else ""
    return {
        "conv_id": f"conv_{conv:08d}",
        "turn_idx": turn,
        "role": role,
        "text": _GENERATORS[cls](conv, turn),
        "tool": tool,
        "ts": EPOCH + dt.timedelta(minutes=turn),
    }


def gen_conv(conv: int, skew_conv_turns: int = 0) -> list[dict]:
    return [gen_turn(conv, t)
            for t in range(turns_in_conv(conv, skew_conv_turns))]


def gen_transcripts(n_convs: int, skew_conv_turns: int = 0) -> list[dict]:
    """Driver-side full materialization (tests / tiny scales only)."""
    rows: list[dict] = []
    for c in range(n_convs):
        rows.extend(gen_conv(c, skew_conv_turns))
    return rows
