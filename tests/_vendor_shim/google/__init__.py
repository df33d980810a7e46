# Test-only namespace package: routes ``google.protobuf`` to a pure-Python
# protobuf runtime already present on the machine (see tests/protobuf_compat).
