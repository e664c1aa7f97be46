"""Model graph: FlowLM (transformer + flow-matching head) and Mimi codec.

Weights load from safetensors into plain nested-dict pytrees whose keys
mirror the checkpoint naming (the reference's VarBuilder paths,
`internal/native/var_builder.go`), so the checkpoint layout doubles as the
parameter schema.
"""
