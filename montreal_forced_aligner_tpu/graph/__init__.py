from montreal_forced_aligner_tpu.graph.compiler import (
    AlignmentGraphCompiler,
    CompiledGraph,
    batch_graphs,
)

__all__ = ["AlignmentGraphCompiler", "CompiledGraph", "batch_graphs"]
