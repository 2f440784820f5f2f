"""JSON extraction & repair from free-form model output.

Reimplements the semantics of the reference's multi-strategy JSON
extractor (``lib/idp_common_pkg/idp_common/utils/__init__.py:133-270``)
and truncated-JSON repair (``:658-1038``):

strategies, in order:
1. fenced code block (```json ... ``` or ``` ... ```),
2. first balanced-brace object / bracket array via brace matching
   (string- and escape-aware),
3. whole-text parse,
4. truncated repair: close unterminated strings, strip a trailing
   incomplete member, balance braces/brackets.

Pure Python, deterministic; used inside Arrow-batched kernels.  The
cheap path for WELL-FORMED payload columns is ``F.from_json`` /
``F.get_json_object`` (JVM) — this kernel exists for the ragged tail,
mirroring how the reference only repairs when parsing fails
(``extraction/service.py:996-1017``).
"""

from __future__ import annotations

import json
import re

_FENCE = re.compile(r"```(?:json)?\s*(.*?)```", re.DOTALL)
_FENCE_ANY = re.compile(r"```(?:json|yaml|yml)?\s*(.*?)```", re.DOTALL)


def _find_balanced(text: str) -> str | None:
    """First balanced {...} or [...] span, string-aware."""
    for opener, closer in (("{", "}"), ("[", "]")):
        start = text.find(opener)
        if start < 0:
            continue
        depth = 0
        in_str = False
        esc = False
        for i in range(start, len(text)):
            ch = text[i]
            if in_str:
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                continue
            if ch == '"':
                in_str = True
            elif ch == opener:
                depth += 1
            elif ch == closer:
                depth -= 1
                if depth == 0:
                    return text[start : i + 1]
        # unbalanced → candidate for repair
        return text[start:]
    return None


def repair_truncated(fragment: str) -> str | None:
    """Best-effort close of a truncated JSON fragment.

    Mirrors the reference's salvage ladder (``utils/__init__.py:658-1038``):
    close an unterminated string, drop a trailing incomplete member
    (after the last complete value), then append missing closers.
    """
    frag = fragment.rstrip()
    # close unterminated string
    in_str = False
    esc = False
    stack: list[str] = []
    for ch in frag:
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch in "{[":
            stack.append(ch)
        elif ch in "}]":
            if stack:
                stack.pop()
    candidates = []
    base = frag + ('"' if in_str else "")
    closers = "".join("}" if c == "{" else "]" for c in reversed(stack))
    candidates.append(base + closers)
    # drop trailing incomplete member: cut back to last , } ] or " then re-close
    for cut_at in (base.rfind(","), base.rfind("}"), base.rfind("]")):
        if cut_at > 0:
            head = base[:cut_at].rstrip()
            # recompute open stack for the head
            st: list[str] = []
            instr = False
            e2 = False
            for ch in head:
                if instr:
                    if e2:
                        e2 = False
                    elif ch == "\\":
                        e2 = True
                    elif ch == '"':
                        instr = False
                    continue
                if ch == '"':
                    instr = True
                elif ch in "{[":
                    st.append(ch)
                elif ch in "}]" and st:
                    st.pop()
            if instr:
                head += '"'
            candidates.append(head + "".join("}" if c == "{" else "]" for c in reversed(st)))
    for cand in candidates:
        try:
            json.loads(cand)
            return cand
        except Exception:
            continue
    return None


try:  # optional, like the reference's guarded import (utils/__init__.py:30-36)
    import yaml as _yaml
except ImportError:  # pragma: no cover - present in this sandbox
    _yaml = None

_YAML_PATTERNS = (
    re.compile(r"^\s*\w+\s*:", re.MULTILINE),  # key: value at line start
    re.compile(r"^\s*-\s+", re.MULTILINE),  # list items
    re.compile(r":\s*\n\s+"),  # multiline values
)


def _yaml_scalar(v: str):
    """YAML 1.1 scalar coercion for the no-pyyaml fallback: int/float/
    bool/null literals become typed values so both parser paths produce
    the SAME canonical JSON ('k: 8' → {"k": 8}, never {"k": "8"})."""
    low = v.lower()
    if low in ("null", "~", ""):
        return None
    if low in ("true", "yes", "on"):
        return True
    if low in ("false", "no", "off"):
        return False
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
        return v[1:-1]
    return v


def _yaml_load(text: str):
    """YAML parse → python value, or raise.  Uses pyyaml when importable;
    otherwise a minimal flat ``key: value`` subset (with typed scalar
    coercion matching pyyaml) so detection AND extraction stay
    environment-independent without the dependency."""
    if _yaml is not None:
        return _yaml.safe_load(text)
    out = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if ":" not in line:
            raise ValueError(f"not flat yaml: {line!r}")
        k, _, v = line.partition(":")
        out[k.strip()] = _yaml_scalar(v.strip())
    return out


def detect_format(text: str | None) -> str:
    """'json' | 'yaml' | 'unknown' — the reference's detection ladder
    (``utils/__init__.py:442-533``): fenced-block markers, the ``---``
    document marker, JSON structural check, YAML structural patterns,
    then try-both preferring JSON."""
    if not text or not text.strip():
        return "unknown"
    t = text.strip()
    low = t.lower()
    if "```json" in low:
        return "json"
    if "```yaml" in low or "```yml" in low:
        return "yaml"
    if t.startswith("---"):
        return "yaml"
    if (t.startswith("{") and t.endswith("}")) or (t.startswith("[") and t.endswith("]")):
        try:
            json.loads(t)
            return "json"
        except Exception:
            pass
    for pat in _YAML_PATTERNS:
        if pat.search(t):
            try:
                _yaml_load(t)
                return "yaml"
            except Exception:
                break
    json_works = yaml_works = False
    try:
        json.loads(t)
        json_works = True
    except Exception:
        pass
    try:
        parsed = _yaml_load(t)
        yaml_works = isinstance(parsed, (dict, list))  # plain scalars aren't structured
    except Exception:
        pass
    if json_works:
        return "json"  # prefer JSON when both parse (reference :529)
    if yaml_works:
        return "yaml"
    return "unknown"


def extract_structured(text: str | None) -> tuple[str | None, str]:
    """Format-dispatched extraction: detect JSON vs YAML, parse with the
    matching parser (YAML re-serialized to canonical JSON), fall back to
    the JSON repair ladder.  Returns (canonical_json, detected_format).
    """
    fmt = detect_format(text)
    if fmt == "yaml":
        body = text.strip()
        m = _FENCE_ANY.search(body)
        if m:
            body = m.group(1)
        try:
            val = _yaml_load(body)
            if isinstance(val, (dict, list)):
                return json.dumps(val, separators=(",", ":")), "yaml"
        except Exception:
            pass
        fmt = "unknown"
    parsed, _repaired = extract_json(text)
    return parsed, ("json" if parsed is not None else fmt)


def extract_json(text: str | None) -> tuple[str | None, bool]:
    """Extract the first JSON value from free text.

    Returns ``(canonical_json_string, repaired_flag)``; (None, False)
    when nothing salvageable.  Canonical form: compact separators,
    sorted=False (input order preserved), ensuring cross-run stability.
    """
    if not text:
        return None, False
    # 1. fenced block
    m = _FENCE.search(text)
    candidates = []
    if m:
        candidates.append(m.group(1))
    # 2. balanced braces
    bal = _find_balanced(text)
    if bal:
        candidates.append(bal)
    # 3. whole text
    candidates.append(text.strip())
    for cand in candidates:
        try:
            return json.dumps(json.loads(cand), separators=(",", ":")), False
        except Exception:
            continue
    # 4. repair
    frag = (m.group(1) if m else None) or bal
    if frag:
        fixed = repair_truncated(frag)
        if fixed is not None:
            return json.dumps(json.loads(fixed), separators=(",", ":")), True
    return None, False
