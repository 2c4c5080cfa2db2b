"""Policy lint — the reference's CI gate checks (SURVEY.md §5).

Reproduced checks:
- every model/snapshot must declare an owner in ``meta.model_owner``
  (``.github/scripts/get_no_owner.py:9-17``)
- non-view models must set ``file_format``
  (``get_no_fileformat.py:25-45``)
- sources declared in project.yml but never referenced are flagged
  (``get_unused_sources.py:4-18``)
- ``ref()`` targets must exist (compile gate, ``test.sh:13``)

Checks run on the parsed project — no Spark session needed — so they can
gate CI exactly like the reference's PR workflow.
"""

from __future__ import annotations

from dataclasses import dataclass

from dbt_spark_models_spark.plans.project import Project


@dataclass
class LintIssue:
    rule: str
    node: str
    message: str


def lint_project(
    project: Project,
    require_owner: bool = True,
    require_file_format: bool = True,
) -> list[LintIssue]:
    issues: list[LintIssue] = []
    used_sources: set[tuple[str, str]] = set()

    for name, node in {**project.models, **project.snapshots}.items():
        meta = node.config.get("meta") or {}
        if require_owner and not (
            meta.get("model_owner") or node.config.get("model_owner")
        ):
            issues.append(
                LintIssue("model_owner", name, "missing meta.model_owner")
            )
        mat = node.config.get("materialized", "view")
        if (
            require_file_format
            and node.kind == "model"
            and mat not in ("view", "ephemeral")
            and "file_format" not in node.config
        ):
            issues.append(
                LintIssue(
                    "file_format",
                    name,
                    f"materialized='{mat}' without explicit file_format",
                )
            )
        for dep in node.depends_on:
            if (
                dep not in project.models
                and dep not in project.seeds
                and dep not in project.snapshots
            ):
                issues.append(
                    LintIssue("unknown_ref", name, f"ref('{dep}') does not exist")
                )
        used_sources.update(node.sources)

    for schema, tables in project.sources.items():
        for table in tables:
            if (schema, table) not in used_sources:
                issues.append(
                    LintIssue(
                        "unused_source",
                        f"{schema}.{table}",
                        "declared in project.yml but never referenced",
                    )
                )
    return issues


# --- style lint (the reference CI's sqlfluff pass, `.sqlfluff:1-56`) ------
#
# The reference lints model SQL with sqlfluff (dialect sparksql, jinja
# templater; workflow `dbt-jobs-pr-tests.yaml:57-64`). Reproduced here is
# the enforceable subset that needs no full SQL parser — each rule tagged
# with its sqlfluff code. Jinja blocks, strings, and comments are masked
# first (`ignore_templated_areas = True`).

_STYLE_MAX_LINE = 200  # [sqlfluff] max_line_length

# CP01 keyword set: conservative — only words that are unambiguous SQL
# keywords in model text (identifiers never collide thanks to \b around
# snake_case names)
_KEYWORDS = (
    "select from where group order having join inner outer cross lateral "
    "union intersect except distinct limit when then else end case with "
    "partition over rows between unbounded preceding following and or not "
    "exists having qualify values insert update delete merge using"
).split()

import re as _re

_KW_RE = _re.compile(
    r"\b(" + "|".join(_KEYWORDS) + r")\b"
)
# backtick-quoted identifiers are masked too: `end` / `order` are QUOTED
# identifiers, never keywords (r10 ADVICE #2)
_MASK_RE = _re.compile(
    r"\{\{.*?\}\}|\{%-?.*?-?%\}|\{#.*?#\}|'[^']*'|\"[^\"]*\"|`[^`]*`|--[^\n]*",
    _re.DOTALL,
)
_NOQA_RE = _re.compile(r"--\s*noqa(?::\s*([A-Z0-9,\s]+))?", _re.IGNORECASE)


def _noqa(raw_line: str) -> set[str] | None:
    """sqlfluff's inline escape: ``-- noqa`` waives every rule on the
    line, ``-- noqa: CP01,LT05`` only the listed codes. Returns the
    waived-code set (empty set = waive all), or None when absent."""
    m = _NOQA_RE.search(raw_line)
    if not m:
        return None
    if not m.group(1):
        return set()
    return {c.strip().upper() for c in m.group(1).split(",") if c.strip()}


def _waived(raw_line: str, code: str) -> bool:
    codes = _noqa(raw_line)
    return codes is not None and (not codes or code in codes)


def _mask(sql: str) -> str:
    """Blank out jinja expressions/blocks/comments, quoted literals, and
    line comments, preserving offsets (newlines kept so line numbers
    survive)."""
    def blank(m: _re.Match) -> str:
        return "".join("\n" if c == "\n" else " " for c in m.group(0))

    return _MASK_RE.sub(blank, sql)


def lint_style(project: Project) -> list[LintIssue]:
    """Style pass over every model/snapshot's raw SQL. Rules (sqlfluff
    codes from the reference's `.sqlfluff`):

    - LT05: line longer than 200 chars
    - CP01: lowercase SQL keyword (capitalisation_policy = upper)
    - LT04: leading-comma line (layout:type:comma = trailing)
    - CV03: trailing comma before FROM (select_trailing_comma = forbid)
    - CV06: final semicolon (require_final_semicolon = False)
    - LT01-tab: hard tab in indentation (indent_unit = space)
    """
    issues: list[LintIssue] = []
    for name, node in {**project.models, **project.snapshots}.items():
        masked = _mask(node.raw_sql)
        lines = masked.split("\n")
        raw_lines = node.raw_sql.split("\n")
        prev_code = ""
        for i, (line, raw) in enumerate(zip(lines, raw_lines), start=1):
            if len(raw) > _STYLE_MAX_LINE and not _waived(raw, "LT05"):
                issues.append(
                    LintIssue("LT05", name, f"line {i} exceeds 200 chars")
                )
            if "\t" in line and not _waived(raw, "LT01"):
                issues.append(
                    LintIssue("LT01", name, f"line {i} uses tab indentation")
                )
            for m in _KW_RE.finditer(line):
                kw = m.group(1)
                if not kw.islower():
                    continue
                # identifier, not keyword (r10 ADVICE #2): a qualified
                # name (t.end / end.ts) or an alias right after AS — a
                # column named `values`/`rows`/`end` must not fail CI
                # that sqlfluff (which parses) would pass
                before = line[: m.start(1)].rstrip()
                after = line[m.end(1) :]
                if before.endswith(".") or after.startswith("."):
                    continue
                prev_word = before.rsplit(None, 1)[-1].upper() if before else ""
                if prev_word == "AS":
                    continue
                if _waived(raw, "CP01"):
                    continue
                issues.append(
                    LintIssue(
                        "CP01",
                        name,
                        f"line {i}: keyword '{kw}' should be upper-case",
                    )
                )
            # LT04 reads the RAW text (masking blanks a string literal in
            # place, so a separator after the literal would misread as
            # leading); CV03 reads the MASKED text so a trailing
            # `-- comment,` can't fake a comma (r10 ADVICE #2)
            raw_stripped = raw.strip()
            code_stripped = line.strip()
            if (
                raw_stripped.startswith(",")
                and code_stripped
                and not _waived(raw, "LT04")
            ):
                issues.append(
                    LintIssue(
                        "LT04", name, f"line {i}: leading comma (use trailing)"
                    )
                )
            if (
                _re.match(r"FROM\b", code_stripped, _re.IGNORECASE)
                and prev_code.endswith(",")
                and not _waived(raw, "CV03")
            ):
                issues.append(
                    LintIssue(
                        "CV03",
                        name,
                        f"line {i}: trailing comma before FROM",
                    )
                )
            if code_stripped:
                # masked text: a trailing `-- comment,` can't taint the
                # comma check (r10 ADVICE #2)
                prev_code = code_stripped
        if masked.rstrip().endswith(";"):
            issues.append(LintIssue("CV06", name, "final semicolon"))
    return issues
