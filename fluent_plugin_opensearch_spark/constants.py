"""Pipeline constants.

Semantics mirror the reference's constant surface
(``lib/fluent/plugin/opensearch_constants.rb:31-39``): write-operation
names, the ``_id`` body key, and the ``@timestamp`` field name. The bulk
newline delimiter has no analog here (we never serialize NDJSON; rows
stay columnar).
"""

# Write operations (opensearch_constants.rb:31-35)
OP_INDEX = "index"
OP_CREATE = "create"
OP_UPDATE = "update"
OP_UPSERT = "upsert"
WRITE_OPERATIONS = (OP_INDEX, OP_CREATE, OP_UPDATE, OP_UPSERT)

# Record / meta field names (opensearch_constants.rb:36-38)
TIMESTAMP_KEY = "@timestamp"
ID_KEY = "_id"
INDEX_KEY = "_index"
ALIAS_KEY = "_alias"
PARENT_KEY = "_parent"
ROUTING_KEY = "routing"

# Outcome classes produced by the error-taxonomy classifier
# (opensearch_error_handler.rb:72-181 → SURVEY.md §2.11)
OUTCOME_SUCCESS = "success"
OUTCOME_DUPLICATE = "duplicate"
OUTCOME_DLQ = "dlq"
OUTCOME_RETRY = "retry"
OUTCOME_ABORT = "abort"
OUTCOMES = (
    OUTCOME_SUCCESS,
    OUTCOME_DUPLICATE,
    OUTCOME_DLQ,
    OUTCOME_RETRY,
    OUTCOME_ABORT,
)

# Default unrecoverable error types (out_opensearch.rb:164-165)
UNRECOVERABLE_ERROR_TYPES = ("out_of_memory_error", "rejected_execution_exception")
UNRECOVERABLE_RECORD_TYPES = ("json_parse_exception",)

# ISO8601 with microsecond precision; Spark timestamps are µs so the
# reference's default 9-digit (ns) precision (out_opensearch.rb:107)
# is truncated to 6 digits — documented divergence (SURVEY.md §7).
ISO8601_US = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
