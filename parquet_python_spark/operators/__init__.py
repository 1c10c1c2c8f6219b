"""Column-block encoder/decoder and the codec auto-selector."""
