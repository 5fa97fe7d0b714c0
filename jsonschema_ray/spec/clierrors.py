"""Typed CLI errors with the reference's exact rendering contract.

The reference prints every failure as ``error: MESSAGE`` followed by
``  at <label> <value>`` detail lines and an optional blank-line hint
(text mode), or as a flat camelCase JSON object (``--json`` mode), with
a per-family exit code (``/root/reference/src/error.h`` +
``src/exit_code.h``: 2 expected failure, 3 not supported, 4 schema
input error, 5 CLI arguments, 6 other input error). Every class
subclasses ``ValueError`` so library callers that catch ``ValueError``
(the engine's generic rejection contract) keep working unchanged.
"""

from __future__ import annotations

import json as _json

EXIT_UNEXPECTED = 1
EXIT_FAIL = 2
EXIT_NOT_SUPPORTED = 3
EXIT_SCHEMA_INPUT = 4
EXIT_ARGS = 5
EXIT_OTHER_INPUT = 6

# field key → text label; values rendered verbatim unless the key is
# in _QUOTED (JSON-pointer locations print quoted)
_LABELS = {
    "identifier": "identifier",
    "line": "line",
    "column": "column",
    "value": "value",
    "keyword": "keyword",
    "uri": "uri",
    "filePath": "file path",
    "resolvePath": "resolve path",
    "instanceLocation": "instance location",
    "facet": "facet",
    "schemaLocation": "schema location",
    "conflictingSchemaLocation": "conflicting schema location",
    "inertOverrideLocation": "inert override location",
    "location": "location",
    "otherLocation": "other location",
    "entry": "entry",
    "regex": "regex",
    "base uri": "base uri",
    "baseURI": "base uri",
}
_QUOTED = {"location", "otherLocation", "instanceLocation", "facet"}

# the reference prints detail fields in one FIXED order regardless of
# construction order (src/error.h print_exception's if-constexpr chain);
# unknown keys keep insertion order after the known ones
_FIELD_ORDER = ["identifier", "value", "keyword", "resolvePath", "line",
                "column", "regex", "instanceLocation", "facet",
                "schemaLocation", "conflictingSchemaLocation",
                "inertOverrideLocation", "filePath", "location",
                "otherLocation", "status", "method", "url", "baseURI"]
_FIELD_RANK = {k: i for i, k in enumerate(_FIELD_ORDER)}


def _ordered_fields(fields: dict) -> list:
    known = [(k, v) for k, v in fields.items() if k in _FIELD_RANK]
    known.sort(key=lambda kv: _FIELD_RANK[kv[0]])
    unknown = [(k, v) for k, v in fields.items() if k not in _FIELD_RANK]
    return known + unknown


class CLIError(ValueError):
    """Base: ``message`` + ordered detail fields + optional hint."""

    exit_code = EXIT_UNEXPECTED
    hint: str | None = None

    def __init__(self, message: str, **fields):
        super().__init__(message)
        self.message = message
        self.fields = {k: v for k, v in fields.items() if v is not None}

    def with_fields(self, **fields) -> "CLIError":
        """Copy with extra/overridden detail fields (e.g. the CLI layer
        stamping ``filePath`` / ``line`` / ``column`` onto a library
        error)."""
        merged = dict(self.fields)
        for k, v in fields.items():
            if v is not None:
                merged[k] = v
        clone = type(self).__new__(type(self))
        ValueError.__init__(clone, self.message)
        clone.message, clone.fields = self.message, merged
        # instance-level overrides must survive the clone
        for attr in ("exit_code", "hint", "labels"):
            if attr in self.__dict__:
                setattr(clone, attr, self.__dict__[attr])
        return clone

    labels: dict | None = None        # per-class label overrides

    def render_text(self) -> str:
        out = f"error: {self.message}\n"
        for key, val in _ordered_fields(self.fields):
            label = (self.labels or {}).get(key) or _LABELS.get(key, key)
            if key in _QUOTED:
                out += f'  at {label} "{val}"\n'
            else:
                out += f"  at {label} {val}\n"
        if self.hint:
            out += "\n" + self.hint + "\n"
        return out

    def render_json(self) -> str:
        from jsonschema_ray.spec.format import prettify_json

        obj = {"error": self.message, **dict(_ordered_fields(self.fields))}
        return prettify_json(obj) + "\n"


class SchemaUnknownBaseDialectError(CLIError):
    exit_code = EXIT_SCHEMA_INPUT
    hint = ("Are you sure the input is a valid JSON Schema and its "
            "base dialect is known?\n"
            "If the input does not declare the `$schema` keyword, you "
            "might want to\n"
            "explicitly declare a default dialect using "
            "`--default-dialect/-d`")

    def __init__(self, **fields):
        super().__init__("Could not determine the base dialect of the "
                         "schema", **fields)


class SchemaResolutionError(CLIError):
    exit_code = EXIT_SCHEMA_INPUT
    hint = ("This is likely because you forgot to import such schema "
            "using `--resolve/-r`")

    def __init__(self, identifier: str, message: str = "Could not "
                 "resolve the metaschema of the schema", **fields):
        super().__init__(message, identifier=identifier, **fields)


class SchemaAnchorCollisionError(CLIError):
    exit_code = EXIT_SCHEMA_INPUT

    def __init__(self, identifier: str, **fields):
        super().__init__("Schema anchor already exists",
                         identifier=identifier, **fields)


class SchemaKeywordError(CLIError):
    """Invalid value for a structural keyword ($id/$schema/$anchor...)."""

    exit_code = EXIT_SCHEMA_INPUT
    hint = ("Are you sure the input is a valid JSON Schema and it is "
            "valid according to its meta-schema?")


class JSONParseError(CLIError):
    exit_code = EXIT_OTHER_INPUT

    def __init__(self, line: int, column: int, **fields):
        super().__init__("Failed to parse the JSON document",
                         line=line, column=column, **fields)


class NoSuchFileError(CLIError):
    exit_code = EXIT_OTHER_INPUT

    def __init__(self, path: str):
        super().__init__("No such file or directory", filePath=path)


class InputIsADirectoryError(CLIError):
    exit_code = EXIT_OTHER_INPUT

    def __init__(self, path: str):
        super().__init__("The input was supposed to be a file but it "
                         "is a directory", filePath=path)


class YAMLNotSupportedError(CLIError):
    exit_code = EXIT_NOT_SUPPORTED

    def __init__(self, path: str):
        super().__init__("This command does not support YAML input "
                         "files yet", filePath=path)


class CLIArgumentError(CLIError):
    exit_code = EXIT_ARGS


class NotSchemaError(CLIError):
    exit_code = EXIT_SCHEMA_INPUT

    def __init__(self, path: str):
        super().__init__("The schema file you provided does not "
                         "represent a valid JSON Schema", filePath=path)


class DuplicateIdentifierError(CLIError):
    exit_code = EXIT_SCHEMA_INPUT

    def __init__(self, identifier: str, **fields):
        super().__init__("Cannot register the same identifier twice",
                         identifier=identifier, **fields)


class ExternalRefError(CLIError):
    exit_code = EXIT_SCHEMA_INPUT
    hint = ("This is likely because you forgot to import such schema "
            "using `--resolve/-r`")

    def __init__(self, identifier: str, **fields):
        super().__init__("Could not resolve the reference to an "
                         "external schema", identifier=identifier,
                         **fields)


class ArgUsageError(CLIError):
    """Top-level argument-parsing errors (src/main.cc option loop):
    unknown command/option, a flag given a value, an option missing
    its value — exit 5 with the help hint."""

    exit_code = EXIT_ARGS
    hint = "Run the `help` command for usage information"


class OptionEnumerationError(CLIError):
    """An option that takes one of a fixed set of values got something
    else (``InvalidOptionEnumerationValueError``): renders the choices
    as a bullet list in text mode and a ``values`` array in JSON."""

    exit_code = EXIT_ARGS

    def __init__(self, message: str, option: str, values: list[str]):
        super().__init__(message, option=option, values=values)

    def render_text(self) -> str:
        out = f"error: {self.message}\n"
        out += f"  at option {self.fields['option']}\n"
        out += "  with values\n"
        for v in self.fields["values"]:
            out += f"  - {v}\n"
        out += "\nRun the `help` command for usage information\n"
        return out


class UnsupportedDialectUpgradeError(CLIError):
    exit_code = EXIT_NOT_SUPPORTED

    def __init__(self, **fields):
        super().__init__("Upgrading schemas from this dialect is not "
                         "supported yet", **fields)


class CustomMetaschemaUpgradeError(CLIError):
    exit_code = EXIT_SCHEMA_INPUT
    hint = ("Schemas that declare a custom meta-schema cannot be "
            "upgraded in place\n"
            "by this command. Please upgrade the meta-schema and the "
            "schema manually.")

    def __init__(self, **fields):
        super().__init__("Cannot upgrade a schema that uses a custom "
                         "meta-schema", **fields)


class SchemaRelativeMetaschemaError(CLIError):
    exit_code = EXIT_SCHEMA_INPUT

    def __init__(self, identifier: str, **fields):
        super().__init__("Relative meta-schema URIs are not valid "
                         "according to the JSON Schema specification",
                         identifier=identifier, **fields)


class SchemaReferenceError(CLIError):
    """A reference that resolves through a non-schema position
    (CompilerReferenceTargetNotSchemaError)."""

    exit_code = EXIT_SCHEMA_INPUT
    hint = ("Are you sure the reported location is a valid JSON Schema "
            "keyword in this dialect?")

    def __init__(self, identifier: str, location: str, **fields):
        super().__init__("The referenced schema is not considered to be "
                         "a valid subschema given the dialect and "
                         "vocabularies in use", identifier=identifier,
                         **fields, location=location)


class CodegenUnsupportedError(CLIError):
    """Unsupported construct for code generation (exit 3): keyword +
    document location (the reference's Codegen*Error family)."""

    exit_code = EXIT_NOT_SUPPORTED
    labels = {"location": "document location"}


class VocabularyError(CLIError):
    exit_code = EXIT_SCHEMA_INPUT

    def __init__(self, uri: str, **fields):
        super().__init__("Unsupported required vocabulary",
                         **fields, uri=uri)


def validate_http_headers(headers) -> None:
    """Reject malformed ``--header`` values the way the reference does
    (exit 5, src/utils.h validate_http_headers)."""
    for h in headers or []:
        if ":" not in h:
            err = CLIArgumentError(
                "HTTP headers must be in the form `Name: Value`")
            err.hint = ('For example: --header "Authorization: '
                        'Bearer ${TOKEN}"')
            raise err


def emit(err: CLIError, *, json_mode: bool, stream=None) -> int:
    """Print the error per mode and return its exit code. Text goes to
    stderr, JSON to stdout (the reference's contract)."""
    import sys

    if json_mode:
        (stream or sys.stdout).write(err.render_json())
    else:
        (stream or sys.stderr).write(err.render_text())
    return err.exit_code
