module @_kernel attributes {stable_mosaic.version = 9 : i64} {
  "stable_mosaic.func.func"() ({
  ^bb0(%arg0: i32, %arg1: memref<50176x128xi8, #tpu.memory_space<any>>, %arg2: memref<128x128xi8, #tpu.memory_space<vmem>>, %arg3: memref<1x128xi32, #tpu.memory_space<vmem>>, %arg4: memref<50176x128xi8, #tpu.memory_space<any>>, %arg5: memref<2x1024x128xi8, #tpu.memory_space<vmem>>, %arg6: memref<2x1024x128xi8, #tpu.memory_space<vmem>>, %arg7: memref<2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>, %arg8: memref<2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>):
    %0 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %1 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %2 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %3 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %4 = "stable_mosaic.tpu.memref_slice"(%arg1, %2, %3) {operandSegmentSizes = array<i32: 1, 2, 0>} : (memref<50176x128xi8, #tpu.memory_space<any>>, i32, i32) -> memref<1024x128xi8, #tpu.memory_space<any>>
    %5 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %6 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %7 = "stable_mosaic.tpu.memref_slice"(%arg5, %0, %5, %6) {operandSegmentSizes = array<i32: 1, 3, 0>} : (memref<2x1024x128xi8, #tpu.memory_space<vmem>>, i32, i32, i32) -> memref<1x1024x128xi8, #tpu.memory_space<vmem>>
    %8 = "stable_mosaic.tpu.memref_squeeze"(%7) : (memref<1x1024x128xi8, #tpu.memory_space<vmem>>) -> memref<1024x128xi8, #tpu.memory_space<vmem>>
    %9 = "stable_mosaic.tpu.memref_slice"(%arg7, %1) {operandSegmentSizes = array<i32: 1, 1, 0>} : (memref<2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>, i32) -> memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
    %10 = "stable_mosaic.tpu.memref_squeeze"(%9) : (memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
    "stable_mosaic.tpu.enqueue_dma"(%4, %8, %10) {operandSegmentSizes = array<i32: 1, 0, 1, 1, 0, 0>, priority = 0 : i32, strict_ordering = false} : (memref<1024x128xi8, #tpu.memory_space<any>>, memref<1024x128xi8, #tpu.memory_space<vmem>>, memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) -> ()
    %11 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %12 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %13 = "stable_mosaic.arith.constant"() {value = 49 : i32} : () -> i32
    %14 = "stable_mosaic.arith.addi"(%12, %13) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
    %15 = "stable_mosaic.arith.constant"() {value = 1 : i32} : () -> i32
    %16 = "stable_mosaic.scf.for"(%12, %14, %15, %11) ({
    ^bb0(%arg9: i32, %arg10: i32):
      %42 = "stable_mosaic.arith.constant"() {value = 2 : i32} : () -> i32
      %43 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %44 = "stable_mosaic.arith.cmpi"(%42, %43) {predicate = 0 : i64} : (i32, i32) -> i1
      %45 = "stable_mosaic.arith.constant"() {value = 1 : i32} : () -> i32
      %46 = "stable_mosaic.arith.select"(%44, %45, %42) : (i1, i32, i32) -> i32
      %47 = "stable_mosaic.arith.remsi"(%arg9, %46) : (i32, i32) -> i32
      %48 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %49 = "stable_mosaic.arith.cmpi"(%47, %48) {predicate = 1 : i64} : (i32, i32) -> i1
      %50 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %51 = "stable_mosaic.arith.cmpi"(%47, %50) {predicate = 2 : i64} : (i32, i32) -> i1
      %52 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %53 = "stable_mosaic.arith.cmpi"(%46, %52) {predicate = 2 : i64} : (i32, i32) -> i1
      %54 = "stable_mosaic.arith.xori"(%51, %53) : (i1, i1) -> i1
      %55 = "stable_mosaic.arith.andi"(%54, %49) : (i1, i1) -> i1
      %56 = "stable_mosaic.arith.addi"(%47, %46) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
      %57 = "stable_mosaic.arith.select"(%55, %56, %47) : (i1, i32, i32) -> i32
      %58 = "stable_mosaic.arith.constant"() {value = 1 : i32} : () -> i32
      %59 = "stable_mosaic.arith.addi"(%arg9, %58) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
      %60 = "stable_mosaic.arith.constant"() {value = 49 : i32} : () -> i32
      %61 = "stable_mosaic.arith.cmpi"(%59, %60) {predicate = 2 : i64} : (i32, i32) -> i1
      %62 = "stable_mosaic.arith.extui"(%61) : (i1) -> i32
      %63 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %64 = "stable_mosaic.arith.cmpi"(%62, %63) {predicate = 1 : i64} : (i32, i32) -> i1
      "stable_mosaic.scf.if"(%64) ({
        %158 = "stable_mosaic.arith.constant"() {value = 1 : i32} : () -> i32
        %159 = "stable_mosaic.arith.addi"(%arg9, %158) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
        %160 = "stable_mosaic.arith.constant"() {value = 2 : i32} : () -> i32
        %161 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
        %162 = "stable_mosaic.arith.cmpi"(%160, %161) {predicate = 0 : i64} : (i32, i32) -> i1
        %163 = "stable_mosaic.arith.constant"() {value = 1 : i32} : () -> i32
        %164 = "stable_mosaic.arith.select"(%162, %163, %160) : (i1, i32, i32) -> i32
        %165 = "stable_mosaic.arith.remsi"(%159, %164) : (i32, i32) -> i32
        %166 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
        %167 = "stable_mosaic.arith.cmpi"(%165, %166) {predicate = 1 : i64} : (i32, i32) -> i1
        %168 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
        %169 = "stable_mosaic.arith.cmpi"(%165, %168) {predicate = 2 : i64} : (i32, i32) -> i1
        %170 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
        %171 = "stable_mosaic.arith.cmpi"(%164, %170) {predicate = 2 : i64} : (i32, i32) -> i1
        %172 = "stable_mosaic.arith.xori"(%169, %171) : (i1, i1) -> i1
        %173 = "stable_mosaic.arith.andi"(%172, %167) : (i1, i1) -> i1
        %174 = "stable_mosaic.arith.addi"(%165, %164) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
        %175 = "stable_mosaic.arith.select"(%173, %174, %165) : (i1, i32, i32) -> i32
        %176 = "stable_mosaic.arith.constant"() {value = 1 : i32} : () -> i32
        %177 = "stable_mosaic.arith.addi"(%arg9, %176) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
        %178 = "stable_mosaic.arith.constant"() {value = 1024 : i32} : () -> i32
        %179 = "stable_mosaic.arith.muli"(%177, %178) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
        %180 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
        %181 = "stable_mosaic.tpu.memref_slice"(%arg1, %179, %180) {operandSegmentSizes = array<i32: 1, 2, 0>} : (memref<50176x128xi8, #tpu.memory_space<any>>, i32, i32) -> memref<1024x128xi8, #tpu.memory_space<any>>
        %182 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
        %183 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
        %184 = "stable_mosaic.tpu.memref_slice"(%arg5, %175, %182, %183) {operandSegmentSizes = array<i32: 1, 3, 0>} : (memref<2x1024x128xi8, #tpu.memory_space<vmem>>, i32, i32, i32) -> memref<1x1024x128xi8, #tpu.memory_space<vmem>>
        %185 = "stable_mosaic.tpu.memref_squeeze"(%184) : (memref<1x1024x128xi8, #tpu.memory_space<vmem>>) -> memref<1024x128xi8, #tpu.memory_space<vmem>>
        %186 = "stable_mosaic.tpu.memref_slice"(%arg7, %175) {operandSegmentSizes = array<i32: 1, 1, 0>} : (memref<2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>, i32) -> memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
        %187 = "stable_mosaic.tpu.memref_squeeze"(%186) : (memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
        "stable_mosaic.tpu.enqueue_dma"(%181, %185, %187) {operandSegmentSizes = array<i32: 1, 0, 1, 1, 0, 0>, priority = 0 : i32, strict_ordering = false} : (memref<1024x128xi8, #tpu.memory_space<any>>, memref<1024x128xi8, #tpu.memory_space<vmem>>, memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) -> ()
        "stable_mosaic.scf.yield"() : () -> ()
      }, {
        "stable_mosaic.scf.yield"() : () -> ()
      }) : (i1) -> ()
      %65 = "stable_mosaic.arith.constant"() {value = 1024 : i32} : () -> i32
      %66 = "stable_mosaic.arith.muli"(%arg9, %65) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
      %67 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %68 = "stable_mosaic.tpu.memref_slice"(%arg1, %66, %67) {operandSegmentSizes = array<i32: 1, 2, 0>} : (memref<50176x128xi8, #tpu.memory_space<any>>, i32, i32) -> memref<1024x128xi8, #tpu.memory_space<any>>
      %69 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %70 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %71 = "stable_mosaic.tpu.memref_slice"(%arg5, %57, %69, %70) {operandSegmentSizes = array<i32: 1, 3, 0>} : (memref<2x1024x128xi8, #tpu.memory_space<vmem>>, i32, i32, i32) -> memref<1x1024x128xi8, #tpu.memory_space<vmem>>
      %72 = "stable_mosaic.tpu.memref_squeeze"(%71) : (memref<1x1024x128xi8, #tpu.memory_space<vmem>>) -> memref<1024x128xi8, #tpu.memory_space<vmem>>
      %73 = "stable_mosaic.tpu.memref_slice"(%arg7, %57) {operandSegmentSizes = array<i32: 1, 1, 0>} : (memref<2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>, i32) -> memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      %74 = "stable_mosaic.tpu.memref_squeeze"(%73) : (memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      "stable_mosaic.tpu.wait_dma2"(%74, %68, %72) {operandSegmentSizes = array<i32: 1, 1, 1, 0, 0>, strict_ordering = false} : (memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>, memref<1024x128xi8, #tpu.memory_space<any>>, memref<1024x128xi8, #tpu.memory_space<vmem>>) -> ()
      %75 = "stable_mosaic.arith.index_cast"(%57) : (i32) -> index
      %76 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
      %77 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
      %78 = "stable_mosaic.vector.load"(%arg5, %75, %76, %77) : (memref<2x1024x128xi8, #tpu.memory_space<vmem>>, index, index, index) -> vector<1x1024x128xi8>
      %79 = "stable_mosaic.vector.shape_cast"(%78) : (vector<1x1024x128xi8>) -> vector<1024x128xi8>
      %80 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
      %81 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
      %82 = "stable_mosaic.vector.load"(%arg2, %80, %81) : (memref<128x128xi8, #tpu.memory_space<vmem>>, index, index) -> vector<128x128xi8>
      %83 = "stable_mosaic.arith.constant"() {value = dense<0> : vector<1024x128xi32>} : () -> vector<1024x128xi32>
      %84 = "stable_mosaic.tpu.matmul"(%79, %82, %83) {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>, transpose_lhs = false, transpose_rhs = false} : (vector<1024x128xi8>, vector<128x128xi8>, vector<1024x128xi32>) -> vector<1024x128xi32>
      %85 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
      %86 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
      %87 = "stable_mosaic.vector.load"(%arg3, %85, %86) : (memref<1x128xi32, #tpu.memory_space<vmem>>, index, index) -> vector<1x128xi32>
      %88 = "stable_mosaic.vector.broadcast"(%87) : (vector<1x128xi32>) -> vector<1024x128xi32>
      %89 = "stable_mosaic.arith.addi"(%84, %88) {overflowFlags = #arith.overflow<none>} : (vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi32>
      %90 = "stable_mosaic.arith.constant"() {value = 64 : i32} : () -> i32
      %91 = "stable_mosaic.vector.broadcast"(%90) : (i32) -> vector<1024x128xi32>
      %92 = "stable_mosaic.arith.addi"(%89, %91) {overflowFlags = #arith.overflow<none>} : (vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi32>
      %93 = "stable_mosaic.arith.constant"() {value = 128 : i32} : () -> i32
      %94 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %95 = "stable_mosaic.arith.cmpi"(%93, %94) {predicate = 0 : i64} : (i32, i32) -> i1
      %96 = "stable_mosaic.arith.constant"() {value = 1 : i32} : () -> i32
      %97 = "stable_mosaic.arith.select"(%95, %96, %93) : (i1, i32, i32) -> i32
      %98 = "stable_mosaic.vector.broadcast"(%97) : (i32) -> vector<1024x128xi32>
      %99 = "stable_mosaic.arith.remsi"(%89, %98) : (vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi32>
      %100 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %101 = "stable_mosaic.vector.broadcast"(%100) : (i32) -> vector<1024x128xi32>
      %102 = "stable_mosaic.arith.cmpi"(%99, %101) {predicate = 1 : i64} : (vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi1>
      %103 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %104 = "stable_mosaic.vector.broadcast"(%103) : (i32) -> vector<1024x128xi32>
      %105 = "stable_mosaic.arith.cmpi"(%99, %104) {predicate = 2 : i64} : (vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi1>
      %106 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %107 = "stable_mosaic.arith.cmpi"(%97, %106) {predicate = 2 : i64} : (i32, i32) -> i1
      %108 = "stable_mosaic.vector.broadcast"(%107) : (i1) -> vector<1024x128xi1>
      %109 = "stable_mosaic.vector.broadcast"(%108) : (vector<1024x128xi1>) -> vector<1024x128xi1>
      %110 = "stable_mosaic.arith.xori"(%105, %109) : (vector<1024x128xi1>, vector<1024x128xi1>) -> vector<1024x128xi1>
      %111 = "stable_mosaic.arith.andi"(%110, %102) : (vector<1024x128xi1>, vector<1024x128xi1>) -> vector<1024x128xi1>
      %112 = "stable_mosaic.vector.broadcast"(%97) : (i32) -> vector<1024x128xi32>
      %113 = "stable_mosaic.arith.addi"(%99, %112) {overflowFlags = #arith.overflow<none>} : (vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi32>
      %114 = "stable_mosaic.arith.select"(%111, %113, %99) : (vector<1024x128xi1>, vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi32>
      %115 = "stable_mosaic.arith.constant"() {value = 64 : i32} : () -> i32
      %116 = "stable_mosaic.vector.broadcast"(%115) : (i32) -> vector<1024x128xi32>
      %117 = "stable_mosaic.arith.cmpi"(%114, %116) {predicate = 0 : i64} : (vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi1>
      %118 = "stable_mosaic.arith.constant"() {value = 8 : i32} : () -> i32
      %119 = "stable_mosaic.vector.broadcast"(%118) : (i32) -> vector<1024x128xi32>
      %120 = "stable_mosaic.arith.shrsi"(%92, %119) : (vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi32>
      %121 = "stable_mosaic.arith.constant"() {value = 1 : i32} : () -> i32
      %122 = "stable_mosaic.vector.broadcast"(%121) : (i32) -> vector<1024x128xi32>
      %123 = "stable_mosaic.arith.shli"(%120, %122) {overflowFlags = #arith.overflow<none>} : (vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi32>
      %124 = "stable_mosaic.arith.constant"() {value = 7 : i32} : () -> i32
      %125 = "stable_mosaic.vector.broadcast"(%124) : (i32) -> vector<1024x128xi32>
      %126 = "stable_mosaic.arith.shrsi"(%92, %125) : (vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi32>
      %127 = "stable_mosaic.arith.select"(%117, %123, %126) : (vector<1024x128xi1>, vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi32>
      %128 = "stable_mosaic.arith.constant"() {value = -127 : i32} : () -> i32
      %129 = "stable_mosaic.arith.constant"() {value = 127 : i32} : () -> i32
      %130 = "stable_mosaic.vector.broadcast"(%128) : (i32) -> vector<1024x128xi32>
      %131 = "stable_mosaic.arith.maxsi"(%130, %127) : (vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi32>
      %132 = "stable_mosaic.vector.broadcast"(%129) : (i32) -> vector<1024x128xi32>
      %133 = "stable_mosaic.arith.minsi"(%132, %131) : (vector<1024x128xi32>, vector<1024x128xi32>) -> vector<1024x128xi32>
      %134 = "stable_mosaic.arith.trunci"(%133) {overflowFlags = #arith.overflow<none>} : (vector<1024x128xi32>) -> vector<1024x128xi8>
      %135 = "stable_mosaic.arith.constant"() {value = 2 : i32} : () -> i32
      %136 = "stable_mosaic.arith.cmpi"(%arg9, %135) {predicate = 5 : i64} : (i32, i32) -> i1
      %137 = "stable_mosaic.arith.extui"(%136) : (i1) -> i32
      %138 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %139 = "stable_mosaic.arith.cmpi"(%137, %138) {predicate = 1 : i64} : (i32, i32) -> i1
      "stable_mosaic.scf.if"(%139) ({
        %158 = "stable_mosaic.arith.constant"() {value = 2 : i32} : () -> i32
        %159 = "stable_mosaic.arith.subi"(%arg9, %158) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
        %160 = "stable_mosaic.arith.constant"() {value = 1024 : i32} : () -> i32
        %161 = "stable_mosaic.arith.muli"(%159, %160) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
        %162 = "stable_mosaic.arith.constant"() {value = 128 : i32} : () -> i32
        %163 = "stable_mosaic.arith.muli"(%arg0, %162) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
        %164 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
        %165 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
        %166 = "stable_mosaic.tpu.memref_slice"(%arg6, %57, %164, %165) {operandSegmentSizes = array<i32: 1, 3, 0>} : (memref<2x1024x128xi8, #tpu.memory_space<vmem>>, i32, i32, i32) -> memref<1x1024x128xi8, #tpu.memory_space<vmem>>
        %167 = "stable_mosaic.tpu.memref_squeeze"(%166) : (memref<1x1024x128xi8, #tpu.memory_space<vmem>>) -> memref<1024x128xi8, #tpu.memory_space<vmem>>
        %168 = "stable_mosaic.tpu.memref_slice"(%arg4, %161, %163) {operandSegmentSizes = array<i32: 1, 2, 0>} : (memref<50176x128xi8, #tpu.memory_space<any>>, i32, i32) -> memref<1024x128xi8, #tpu.memory_space<any>>
        %169 = "stable_mosaic.tpu.memref_slice"(%arg8, %57) {operandSegmentSizes = array<i32: 1, 1, 0>} : (memref<2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>, i32) -> memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
        %170 = "stable_mosaic.tpu.memref_squeeze"(%169) : (memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
        "stable_mosaic.tpu.wait_dma2"(%170, %167, %168) {operandSegmentSizes = array<i32: 1, 1, 1, 0, 0>, strict_ordering = false} : (memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>, memref<1024x128xi8, #tpu.memory_space<vmem>>, memref<1024x128xi8, #tpu.memory_space<any>>) -> ()
        "stable_mosaic.scf.yield"() : () -> ()
      }, {
        "stable_mosaic.scf.yield"() : () -> ()
      }) : (i1) -> ()
      %140 = "stable_mosaic.arith.index_cast"(%57) : (i32) -> index
      %141 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
      %142 = "stable_mosaic.arith.constant"() {value = 0 : index} : () -> index
      %143 = "stable_mosaic.vector.load"(%arg6, %140, %141, %142) : (memref<2x1024x128xi8, #tpu.memory_space<vmem>>, index, index, index) -> vector<1x1024x128xi8>
      %144 = "stable_mosaic.vector.shape_cast"(%143) : (vector<1x1024x128xi8>) -> vector<1024x128xi8>
      %145 = "stable_mosaic.vector.shape_cast"(%134) : (vector<1024x128xi8>) -> vector<1x1024x128xi8>
      "stable_mosaic.tpu.vector_store"(%145, %arg6, %140, %141, %142) {add = false, operandSegmentSizes = array<i32: 1, 1, 3, 0>, strides = array<i32>} : (vector<1x1024x128xi8>, memref<2x1024x128xi8, #tpu.memory_space<vmem>>, index, index, index) -> ()
      %146 = "stable_mosaic.arith.constant"() {value = 1024 : i32} : () -> i32
      %147 = "stable_mosaic.arith.muli"(%arg9, %146) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
      %148 = "stable_mosaic.arith.constant"() {value = 128 : i32} : () -> i32
      %149 = "stable_mosaic.arith.muli"(%arg0, %148) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
      %150 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %151 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      %152 = "stable_mosaic.tpu.memref_slice"(%arg6, %57, %150, %151) {operandSegmentSizes = array<i32: 1, 3, 0>} : (memref<2x1024x128xi8, #tpu.memory_space<vmem>>, i32, i32, i32) -> memref<1x1024x128xi8, #tpu.memory_space<vmem>>
      %153 = "stable_mosaic.tpu.memref_squeeze"(%152) : (memref<1x1024x128xi8, #tpu.memory_space<vmem>>) -> memref<1024x128xi8, #tpu.memory_space<vmem>>
      %154 = "stable_mosaic.tpu.memref_slice"(%arg4, %147, %149) {operandSegmentSizes = array<i32: 1, 2, 0>} : (memref<50176x128xi8, #tpu.memory_space<any>>, i32, i32) -> memref<1024x128xi8, #tpu.memory_space<any>>
      %155 = "stable_mosaic.tpu.memref_slice"(%arg8, %57) {operandSegmentSizes = array<i32: 1, 1, 0>} : (memref<2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>, i32) -> memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      %156 = "stable_mosaic.tpu.memref_squeeze"(%155) : (memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
      "stable_mosaic.tpu.enqueue_dma"(%153, %154, %156) {operandSegmentSizes = array<i32: 1, 0, 1, 1, 0, 0>, priority = 0 : i32, strict_ordering = false} : (memref<1024x128xi8, #tpu.memory_space<vmem>>, memref<1024x128xi8, #tpu.memory_space<any>>, memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) -> ()
      %157 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
      "stable_mosaic.scf.yield"(%157) : (i32) -> ()
    }) : (i32, i32, i32, i32) -> i32
    %17 = "stable_mosaic.arith.constant"() {value = 49 : i32} : () -> i32
    %18 = "stable_mosaic.arith.constant"() {value = 128 : i32} : () -> i32
    %19 = "stable_mosaic.arith.muli"(%arg0, %18) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
    %20 = "stable_mosaic.arith.constant"() {value = 1 : i32} : () -> i32
    %21 = "stable_mosaic.arith.constant"() {value = 1 : i32} : () -> i32
    %22 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %23 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %24 = "stable_mosaic.tpu.memref_slice"(%arg6, %20, %22, %23) {operandSegmentSizes = array<i32: 1, 3, 0>} : (memref<2x1024x128xi8, #tpu.memory_space<vmem>>, i32, i32, i32) -> memref<1x1024x128xi8, #tpu.memory_space<vmem>>
    %25 = "stable_mosaic.tpu.memref_squeeze"(%24) : (memref<1x1024x128xi8, #tpu.memory_space<vmem>>) -> memref<1024x128xi8, #tpu.memory_space<vmem>>
    %26 = "stable_mosaic.arith.constant"() {value = 48128 : i32} : () -> i32
    %27 = "stable_mosaic.tpu.memref_slice"(%arg4, %26, %19) {operandSegmentSizes = array<i32: 1, 2, 0>} : (memref<50176x128xi8, #tpu.memory_space<any>>, i32, i32) -> memref<1024x128xi8, #tpu.memory_space<any>>
    %28 = "stable_mosaic.tpu.memref_slice"(%arg8, %21) {operandSegmentSizes = array<i32: 1, 1, 0>} : (memref<2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>, i32) -> memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
    %29 = "stable_mosaic.tpu.memref_squeeze"(%28) : (memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
    "stable_mosaic.tpu.wait_dma2"(%29, %25, %27) {operandSegmentSizes = array<i32: 1, 1, 1, 0, 0>, strict_ordering = false} : (memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>, memref<1024x128xi8, #tpu.memory_space<vmem>>, memref<1024x128xi8, #tpu.memory_space<any>>) -> ()
    %30 = "stable_mosaic.arith.constant"() {value = 128 : i32} : () -> i32
    %31 = "stable_mosaic.arith.muli"(%arg0, %30) {overflowFlags = #arith.overflow<none>} : (i32, i32) -> i32
    %32 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %33 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %34 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %35 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %36 = "stable_mosaic.tpu.memref_slice"(%arg6, %32, %34, %35) {operandSegmentSizes = array<i32: 1, 3, 0>} : (memref<2x1024x128xi8, #tpu.memory_space<vmem>>, i32, i32, i32) -> memref<1x1024x128xi8, #tpu.memory_space<vmem>>
    %37 = "stable_mosaic.tpu.memref_squeeze"(%36) : (memref<1x1024x128xi8, #tpu.memory_space<vmem>>) -> memref<1024x128xi8, #tpu.memory_space<vmem>>
    %38 = "stable_mosaic.arith.constant"() {value = 49152 : i32} : () -> i32
    %39 = "stable_mosaic.tpu.memref_slice"(%arg4, %38, %31) {operandSegmentSizes = array<i32: 1, 2, 0>} : (memref<50176x128xi8, #tpu.memory_space<any>>, i32, i32) -> memref<1024x128xi8, #tpu.memory_space<any>>
    %40 = "stable_mosaic.tpu.memref_slice"(%arg8, %33) {operandSegmentSizes = array<i32: 1, 1, 0>} : (memref<2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>, i32) -> memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
    %41 = "stable_mosaic.tpu.memref_squeeze"(%40) : (memref<1x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) -> memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>
    "stable_mosaic.tpu.wait_dma2"(%41, %37, %39) {operandSegmentSizes = array<i32: 1, 1, 1, 0, 0>, strict_ordering = false} : (memref<!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>, memref<1024x128xi8, #tpu.memory_space<vmem>>, memref<1024x128xi8, #tpu.memory_space<any>>) -> ()
    "stable_mosaic.func.return"() : () -> ()
  }) {dimension_semantics = [#tpu.dimension_semantics<arbitrary>], function_type = (i32, memref<50176x128xi8, #tpu.memory_space<any>>, memref<128x128xi8, #tpu.memory_space<vmem>>, memref<1x128xi32, #tpu.memory_space<vmem>>, memref<50176x128xi8, #tpu.memory_space<any>>, memref<2x1024x128xi8, #tpu.memory_space<vmem>>, memref<2x1024x128xi8, #tpu.memory_space<vmem>>, memref<2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>, memref<2x!tpu.dma_semaphore, #tpu.memory_space<semaphore_mem>>) -> (), iteration_bounds = array<i64: 1>, scalar_prefetch = 0 : i64, scratch_operands = 4 : i64, sym_name = "main", window_params = [{}, {transform_indices = @transform_1, window_bounds = array<i64: 128, 128>}, {transform_indices = @transform_2, window_bounds = array<i64: 1, 128>}, {}]} : () -> ()
  "stable_mosaic.func.func"() ({
  ^bb0(%arg0: i32):
    %0 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %1 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    "stable_mosaic.func.return"(%0, %arg0) : (i32, i32) -> ()
  }) {function_type = (i32) -> (i32, i32), sym_name = "transform_1"} : () -> ()
  "stable_mosaic.func.func"() ({
  ^bb0(%arg0: i32):
    %0 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    %1 = "stable_mosaic.arith.constant"() {value = 0 : i32} : () -> i32
    "stable_mosaic.func.return"(%0, %arg0) : (i32, i32) -> ()
  }) {function_type = (i32) -> (i32, i32), sym_name = "transform_2"} : () -> ()
}
