"""Job configuration + validation (SURVEY.md §2.1 S6).

Re-derives the reference's config/validation surface — the
DkuConfig/DSSParameter/CustomCheck stack (python-lib/config/dku_config.py,
dss_parameter.py, custom_check.py, dku_plugin_config_loading.py:18-235) —
as a plain dataclass validated on the driver before the job launches:
column-existence checks (dku_plugin_config_loading.py:161-174), language
whitelist (:113-131, :153-159), output-format membership
(recipe.json:388-407). Error messages keep the reference's actionable
style.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .functions.langsupport import SUPPORTED_LANGUAGES
from .operators.ontology import TagOptions
from .operators.tagger import OUTPUT_FORMATS

__all__ = ["KGJobConfig", "ConfigError"]


class ConfigError(ValueError):
    """Raised when a job parameter fails validation (reference
    config/dss_parameter.py:15-91 DSSParameterError equivalent)."""


@dataclass
class KGJobConfig:
    text_column: str = "text"
    language: str | None = None           # single-language mode
    language_column: str | None = "lang"  # multilingual mode
    tag_column: str = "tag"
    keyword_column: str = "keyword"
    category_column: str | None = None
    output_format: str = "one_row_per_match"
    options: TagOptions = field(default_factory=TagOptions)
    languages: list[str] | None = None    # explicit set: skips the pre-scan
    skip_unknown_languages: bool = False

    def validate(self, docs_df: DataFrame, ontology_df: DataFrame) -> "KGJobConfig":
        """Driver-side semantic analysis; raises ConfigError with the first
        failed check (reference fails fast the same way)."""
        self._require_column(docs_df, self.text_column, "document dataset")
        if not self.language and not self.language_column:
            raise ConfigError(
                "Specify either a language or a language column "
                "(reference recipe.json:302-316)."
            )
        if self.language_column:
            self._require_column(docs_df, self.language_column, "document dataset")
        if self.language and self.language not in SUPPORTED_LANGUAGES:
            raise ConfigError(f"Unsupported language code: '{self.language}'")
        for col, name in ((self.tag_column, "tag"), (self.keyword_column, "keyword")):
            self._require_column(ontology_df, col, f"ontology dataset ({name} column)")
        if self.category_column:
            self._require_column(ontology_df, self.category_column, "ontology dataset")
        if self.output_format not in OUTPUT_FORMATS:
            raise ConfigError(
                f"Invalid output format '{self.output_format}'; expected one of {OUTPUT_FORMATS}"
            )
        if self.languages:
            bad = [l for l in self.languages if l not in SUPPORTED_LANGUAGES]
            if bad and not self.skip_unknown_languages:
                raise ConfigError(f"Unsupported language code(s): {sorted(bad)}")
        return self

    @staticmethod
    def _require_column(df: DataFrame, col: str, where: str) -> None:
        if col not in df.columns:
            raise ConfigError(
                f"Invalid parameter: column '{col}' does not exist in the {where}. "
                f"Available columns: {df.columns}"
            )

    def run(self, docs_df: DataFrame, ontology_df: DataFrame) -> DataFrame:
        """Validate then execute the tagging recipe (recipe.py:1-42 flow)."""
        from .operators.tagger import tag_documents

        self.validate(docs_df, ontology_df)
        return tag_documents(
            docs_df,
            ontology_df,
            text_col=self.text_column,
            lang_col=self.language_column,
            language=self.language or "en",
            tag_col=self.tag_column,
            keyword_col=self.keyword_column,
            category_col=self.category_column,
            output_format=self.output_format,
            options=self.options,
            languages=self.languages,
            skip_unknown=self.skip_unknown_languages,
        )
