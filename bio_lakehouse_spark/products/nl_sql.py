"""NL-to-SQL surface (ref insights_engine/core/nl_to_sql.py).

Same shape as the reference with ``spark.sql`` behind the facade
instead of Athena, and the LLM behind an injectable interface so the
pipeline is fully testable offline (a deterministic stub stands in; a
real client plugs into ``llm``): live schema DDL injected into the
system prompt, few-shot examples as the first exchange, conversation
history replayed, JSON response parsing with markdown-fence stripping
and brace-scan fallback, a SELECT/WITH gate before execution, and the
result preview → second LLM call → prose answer step.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from dataclasses import dataclass, field

import pandas as pd

from bio_lakehouse_spark.engine import QueryEngine

SYSTEM_PROMPT_TEMPLATE = """You translate natural-language questions
about personal health data into Spark SQL.

Rules:
- Dates in silver/gold tables are VARCHAR and may be 'YYYY-MM-DD' or
  'YYYY-MM-DD HH:MM:SS'. Always parse with
  COALESCE(TRY_TO_TIMESTAMP(date, 'yyyy-MM-dd'),
           TRY_TO_TIMESTAMP(date, 'yyyy-MM-dd HH:mm:ss'))::date.
- Only produce SELECT or WITH statements.
- Respond as JSON: {"sql": ..., "explanation": ..., "assumptions":
  [...], "confidence": 0.0-1.0}.

Schema:
{schema_ddl}
"""

FEW_SHOT_EXAMPLES = """Q: What was my average readiness score last week?
A: {"sql": "SELECT ROUND(AVG(readiness_score), 1) AS avg_readiness FROM dashboard_30day WHERE date >= date_format(date_sub(current_date(), 7), 'yyyy-MM-dd')", "explanation": "7-day average readiness from the dashboard view", "assumptions": ["last week = trailing 7 days"], "confidence": 0.95}

Q: Is my sleep correlated with my readiness?
A: {"sql": "SELECT sleep_readiness_corr FROM readiness_performance_correlation WHERE segment = 'All Days'", "explanation": "Pre-computed correlation from the analytics view", "assumptions": [], "confidence": 0.95}
"""


@dataclass
class NLToSQLResult:
    sql: str
    explanation: str
    assumptions: list[str]
    confidence: float


@dataclass
class AnswerResult:
    question: str
    sql: str
    explanation: str
    assumptions: list[str]
    confidence: float
    data: pd.DataFrame
    answer: str
    execution_time_ms: int
    row_count: int
    error: str | None = None


def parse_llm_json(raw_text: str) -> dict:
    """The reference's tolerant JSON extraction (nl_to_sql.py:124-150):
    strip markdown code fences, then plain loads, then brace-scan."""
    raw_text = raw_text.strip()
    if raw_text.startswith("```"):
        raw_text = raw_text.split("```")[1]
        if raw_text.startswith("json"):
            raw_text = raw_text[4:]
        raw_text = raw_text.strip()
    try:
        return json.loads(raw_text)
    except json.JSONDecodeError:
        start = raw_text.find("{")
        end = raw_text.rfind("}") + 1
        if start >= 0 and end > start:
            return json.loads(raw_text[start:end])
        raise ValueError(
            f"Could not parse LLM response as JSON: {raw_text[:200]}"
        )


# LLM interface: (system_prompt, messages) -> text
LLMFn = Callable[[str, list[dict]], str]


def stub_llm(responses: dict[str, str] | None = None) -> LLMFn:
    """Deterministic offline LLM: looks the question up in a canned
    table, else emits a safe fallback query."""
    canned = responses or {}

    def call(system: str, messages: list[dict]) -> str:
        question = messages[-1]["content"]
        if question in canned:
            return canned[question]
        return json.dumps(
            {
                "sql": "SELECT COUNT(*) AS n_rows FROM gold_daily_rollup",
                "explanation": "fallback row count",
                "assumptions": ["stub LLM"],
                "confidence": 0.1,
            }
        )

    return call


@dataclass
class NLToSQLEngine:
    engine: QueryEngine
    llm: LLMFn = field(default_factory=stub_llm)
    answer_llm: LLMFn | None = None

    def system_prompt(self) -> str:
        return SYSTEM_PROMPT_TEMPLATE.replace(
            "{schema_ddl}", self.engine.get_schema_ddl()
        )

    def translate(
        self, question: str, history: list[dict] | None = None
    ) -> NLToSQLResult:
        messages = [
            {"role": "user",
             "content": f"Here are example translations:\n\n{FEW_SHOT_EXAMPLES}"},
            {"role": "assistant",
             "content": "I understand the schema and example patterns."},
        ]
        for entry in history or []:
            messages.append({"role": "user", "content": entry["question"]})
            messages.append(
                {"role": "assistant", "content": json.dumps(entry["result"])}
            )
        messages.append({"role": "user", "content": question})
        parsed = parse_llm_json(self.llm(self.system_prompt(), messages))
        return NLToSQLResult(
            sql=parsed.get("sql", ""),
            explanation=parsed.get("explanation", ""),
            assumptions=parsed.get("assumptions", []),
            confidence=float(parsed.get("confidence", 0.0)),
        )

    def ask(
        self, question: str, history: list[dict] | None = None
    ) -> AnswerResult:
        t0 = time.time()

        def _err(nl: NLToSQLResult | None, msg: str) -> AnswerResult:
            return AnswerResult(
                question=question,
                sql=nl.sql if nl else "",
                explanation=nl.explanation if nl else "",
                assumptions=nl.assumptions if nl else [],
                confidence=nl.confidence if nl else 0.0,
                data=pd.DataFrame(),
                answer="",
                execution_time_ms=int((time.time() - t0) * 1000),
                row_count=0,
                error=msg,
            )

        try:
            nl = self.translate(question, history)
        except Exception as e:  # noqa: BLE001
            return _err(None, f"Translation error: {e}")
        gate = nl.sql.strip().lstrip("(").upper()
        if not gate.startswith(("SELECT", "WITH")):
            return _err(nl, "Only SELECT queries are allowed. Please rephrase your question.")
        try:
            data = self.engine.execute(nl.sql).toPandas()
        except Exception as e:  # noqa: BLE001
            return _err(nl, f"Query error: {e}")
        answer = self._format_answer(question, data)
        return AnswerResult(
            question=question,
            sql=nl.sql,
            explanation=nl.explanation,
            assumptions=nl.assumptions,
            confidence=nl.confidence,
            data=data,
            answer=answer,
            execution_time_ms=int((time.time() - t0) * 1000),
            row_count=len(data),
            error=None,
        )

    def _format_answer(self, question: str, data: pd.DataFrame) -> str:
        """Preview (20 rows) → answer LLM → prose; without an answer
        LLM, a deterministic template (the testable default)."""
        preview = data.head(20).to_string(index=False)
        if self.answer_llm is not None:
            return self.answer_llm(
                "Answer the user's question in one or two sentences using "
                "only the query result below.",
                [{"role": "user",
                  "content": f"Question: {question}\n\nResult:\n{preview}"}],
            )
        if data.empty:
            return "The query returned no rows."
        if data.shape == (1, 1):
            return f"{data.columns[0]}: {data.iloc[0, 0]}"
        return f"The query returned {len(data)} rows:\n{preview}"
