"""Prompt engine: multi-prompt splitting and template macros.

Reference: shared/utils/prompt_parser.py — split modes (G: one generation per
line, PG: per paragraph, W/PW: one sliding window per line/paragraph, FG:
whole text is one prompt) and '!'-macro template expansion
(`! {var}="a","b" : {x}="1","2"` followed by template lines containing
{var}/{x} placeholders; each value index yields one expanded output).
"""
from __future__ import annotations

import re
from typing import Dict, List, Tuple


def split_prompt_units(prompt_text: str, mode: str = "G",
                       single_prompt: bool = False) -> List[str]:
    text = (prompt_text or "").replace("\r\n", "\n").replace("\r", "\n")
    lines = [ln.rstrip() for ln in text.split("\n")
             if not ln.strip().startswith("#")]
    text = "\n".join(lines).strip()
    if not text:
        return []
    if single_prompt or mode == "FG":
        return [text]
    if "P" in (mode or ""):
        paragraphs, cur = [], []
        for ln in text.split("\n"):
            if not ln.strip():
                if cur:
                    paragraphs.append("\n".join(cur))
                    cur = []
            else:
                cur.append(ln)
        if cur:
            paragraphs.append("\n".join(cur))
        return paragraphs
    return [ln for ln in text.split("\n") if ln.strip()]


_VAR_RE = re.compile(r'\{([^}]+)\}\s*=\s*((?:"[^"]*"\s*,?\s*)+)')


def process_template(input_text: str) -> Tuple[str, str]:
    """Expand '!'-macro templates.  Returns (output_text, error).

    Variables with multiple quoted values expand the following template
    lines once per value index (shorter lists repeat their last value)."""
    lines = (input_text or "").replace("\r\n", "\n").strip().split("\n")
    variables: Dict[str, List[str]] = {}
    template: List[str] = []
    out: List[str] = []

    def flush():
        nonlocal template
        if not template:
            return ""
        if variables:
            n = max(len(v) for v in variables.values())
            for i in range(n):
                for ln in template:
                    expanded = ln
                    for name, vals in variables.items():
                        val = vals[min(i, len(vals) - 1)]
                        expanded = expanded.replace("{%s}" % name, val)
                    if "{" in expanded and "}" in expanded:
                        return (f"Unknown variable in line: '{ln}'")
                    out.append(expanded)
        else:
            out.extend(template)
        template = []
        return ""

    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("!"):
            err = flush()
            if err:
                return "", err
            variables = {}
            macro = line[1:].strip()
            if macro.count("{") != macro.count("}"):
                return "", f"Unmatched braces\nLine: '{raw}'"
            if macro.count('"') % 2:
                return "", f"Unclosed double quotes\nLine: '{raw}'"
            found = False
            for m in _VAR_RE.finditer(macro):
                name = m.group(1).strip()
                if not name:
                    return "", f"Empty variable name\nLine: '{raw}'"
                vals = re.findall(r'"([^"]*)"', m.group(2))
                variables[name] = vals
                found = True
            if not found and "{" in macro:
                return "", f"Malformed variable declaration\nLine: '{raw}'"
        else:
            template.append(line)
    err = flush()
    if err:
        return "", err
    return "\n".join(out), ""
