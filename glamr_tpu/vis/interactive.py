"""Interactive 3D animation viewing (reference: lib/utils/visualizer3d.py:
75-240 — a pyvista window loop with key bindings for play/pause/step/
speed/reverse/repeat and free camera interaction).

Two backends, same scene source (any Visualizer3D subclass):

* ``save_interactive_html`` — captures every frame's draw calls, quantizes
  the vertex streams and writes ONE self-contained HTML file with an
  embedded vanilla-JS renderer: orbit/zoom camera, ground plane, flat
  shading, and the reference's exact key bindings (q close, space pause,
  Left/Right step, s/d slow/speed, a reverse, g repeat, Up/Down start/
  end). No network, no GL stack, no display server needed at export time
  — the natural interactive path on a headless TPU pod: render artifacts
  ship to wherever a browser is.
* ``show_interactive`` — the reference-style native pyvista window with
  the same key bindings, used when pyvista + a display are available
  (gated import; absent in minimal images).
"""
from __future__ import annotations

import base64
import json
import os
from typing import Optional

import numpy as np


# --------------------------------------------------------------- capture

def capture_scene(vis, num_fr: int):
    """Drive vis.update_scene over all frames and record the draw calls.

    Assumes a stable actor order across frames (true for SMPLVisualizer /
    GReconVisualizer: actors submit in construction order). Mesh slots
    store faces/color once and a (T, V, 3) vertex stream; lines/points
    are stored ragged per frame.
    """
    slots = None                        # per mesh submission slot
    lines, points = [], []              # per frame
    for fr in range(num_fr):
        vis._tris, vis._lines, vis._points = [], [], []
        vis.update_scene(fr)
        if slots is None:
            slots = [{"faces": np.asarray(f, np.int32),
                      "color": np.asarray(c, np.float64).tolist(),
                      "verts": [], "opacity": []}
                     for (_, f, c, _) in vis._tris]
        if len(vis._tris) != len(slots):
            raise ValueError(
                "interactive capture needs a stable actor count per frame "
                f"(frame {fr}: {len(vis._tris)} vs {len(slots)})")
        for slot, (v, f, c, op) in zip(slots, vis._tris):
            slot["verts"].append(np.asarray(v, np.float32))
            slot["opacity"].append(float(op))
        lines.append([(np.asarray(s, np.float32), np.asarray(e, np.float32),
                       tuple(col), int(th))
                      for s, e, col, th in vis._lines])
        points.append([(np.asarray(p, np.float32), tuple(col), int(r))
                       for p, col, r in vis._points])
    return {"slots": slots or [], "lines": lines, "points": points,
            "num_fr": num_fr}


def _quantize(verts: np.ndarray):
    """(T, V, 3) float -> uint16 + (lo, scale) dequant params."""
    lo = verts.min(axis=(0, 1))
    hi = verts.max(axis=(0, 1))
    scale = np.maximum(hi - lo, 1e-6) / 65535.0
    q = np.round((verts - lo) / scale).astype(np.uint16)
    return q, lo.astype(np.float64), scale.astype(np.float64)


def _b64(arr: np.ndarray) -> str:
    return base64.b64encode(np.ascontiguousarray(arr).tobytes()).decode()


def _pack_ragged(per_frame_xyz):
    """list over frames of (N_fr, 3) float32 -> (flat buffer, offsets)."""
    offs = np.zeros(len(per_frame_xyz) + 1, np.int64)
    bufs = []
    for i, a in enumerate(per_frame_xyz):
        a = a.reshape(-1, 3) if a.size else np.zeros((0, 3), np.float32)
        bufs.append(a.astype(np.float32))
        offs[i + 1] = offs[i] + a.shape[0]
    flat = (np.concatenate(bufs) if bufs
            else np.zeros((0, 3), np.float32))
    return flat, offs.astype(np.int32)


def export_html(captured: dict, out_path: str, fps: float = 30.0,
                title: str = "GLAMR interactive viewer",
                ground_z: float = 0.0, show_ground: bool = True) -> str:
    """Write the captured scene as one self-contained HTML viewer file."""
    meta = {"num_fr": int(captured["num_fr"]), "fps": float(fps),
            "title": title, "ground_z": float(ground_z),
            "show_ground": bool(show_ground), "meshes": []}
    bufs = {}

    for i, slot in enumerate(captured["slots"]):
        verts = np.stack(slot["verts"])                 # (T, V, 3)
        q, lo, scale = _quantize(verts)
        bufs[f"mv{i}"] = _b64(q)
        bufs[f"mf{i}"] = _b64(slot["faces"].astype(np.int32))
        meta["meshes"].append({
            "nv": int(verts.shape[1]), "nf": int(slot["faces"].shape[0]),
            "lo": lo.tolist(), "scale": scale.tolist(),
            "color": slot["color"],
            "opacity": [round(o, 3) for o in slot["opacity"]]})

    # lines: one flat segment buffer (start,end interleaved) + offsets;
    # per-frame colors reduced to the first submission's color (segments
    # within a frame keep per-submission colors via a color index array)
    seg_frames, seg_colors = [], []
    for frame in captured["lines"]:
        if frame:
            segs = np.concatenate([
                np.stack([s, e], axis=1).reshape(-1, 3)
                for s, e, _, _ in frame])               # (2*N, 3)
            # one color row per ENDPOINT row (2 per segment): the JS draw
            # loop walks endpoint offsets in steps of 2 and reads the
            # color at the segment's start row (lineCol[i*3])
            cols = np.concatenate([
                np.tile(np.asarray(col, np.float32), (2 * len(s), 1))
                for s, e, col, _ in frame])
        else:
            segs = np.zeros((0, 3), np.float32)
            cols = np.zeros((0, 3), np.float32)
        seg_frames.append(segs)
        seg_colors.append(cols)
    flat, offs = _pack_ragged(seg_frames)
    bufs["lines"] = _b64(flat)
    bufs["line_off"] = _b64(offs)
    bufs["line_col"] = _b64((np.concatenate(seg_colors) if seg_colors
                             else np.zeros((0, 3), np.float32))
                            .astype(np.uint8))

    pt_frames, pt_colors = [], []
    for frame in captured["points"]:
        if frame:
            pts = np.concatenate([p.reshape(-1, 3) for p, _, _ in frame])
            cols = np.concatenate([
                np.tile(np.asarray(col, np.float32), (len(p), 1))
                for p, col, _ in frame])
        else:
            pts = np.zeros((0, 3), np.float32)
            cols = np.zeros((0, 3), np.float32)
        pt_frames.append(pts)
        pt_colors.append(cols)
    flat, offs = _pack_ragged(pt_frames)
    bufs["points"] = _b64(flat)
    bufs["point_off"] = _b64(offs)
    bufs["point_col"] = _b64((np.concatenate(pt_colors) if pt_colors
                              else np.zeros((0, 3), np.float32))
                             .astype(np.uint8))

    html = (_HTML_TEMPLATE
            .replace("__TITLE__", title)
            .replace("__META__", json.dumps(meta))
            .replace("__BUFS__", json.dumps(bufs)))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write(html)
    return out_path


def save_interactive_html(vis, out_path: str, num_fr: Optional[int] = None,
                          fps: float = 30.0, title: str = "GLAMR") -> str:
    """Capture a Visualizer3D subclass and export the HTML viewer."""
    if num_fr is None:
        num_fr = getattr(vis, "num_fr")
    cap = capture_scene(vis, num_fr)
    return export_html(cap, out_path, fps=fps, title=title,
                       ground_z=getattr(vis, "ground_z", 0.0),
                       show_ground=getattr(vis, "show_ground", True))


# ------------------------------------------------------- native (pyvista)

def show_interactive(vis, num_fr: Optional[int] = None, fps: float = 30.0,
                     window_size=(960, 540)):
    """Reference-style interactive pyvista window (visualizer3d.py:75-240):
    same key bindings, per-frame mesh point updates, free VTK camera.
    Requires pyvista + a display; raises ImportError otherwise.
    """
    try:
        import pyvista
    except ImportError as e:                            # pragma: no cover
        raise ImportError(
            "pyvista is not available — use save_interactive_html() to "
            "export a self-contained browser viewer instead") from e

    if num_fr is None:
        num_fr = getattr(vis, "num_fr")
    cap = capture_scene(vis, num_fr)
    pl = pyvista.Plotter(window_size=window_size)
    state = {"fr": 0, "paused": False, "reverse": False, "repeat": True,
             "fps": fps}
    polys, actors = [], []
    for slot in cap["slots"]:
        faces = slot["faces"]
        vtk_faces = np.column_stack(
            [np.full(len(faces), 3, np.int64), faces]).ravel()
        poly = pyvista.PolyData(slot["verts"][0].astype(np.float64),
                                vtk_faces)
        actor = pl.add_mesh(poly, color=[c / 255 for c in slot["color"]],
                            smooth_shading=True)
        polys.append(poly)
        actors.append(actor)

    def update():
        fr = state["fr"]
        for poly, actor, slot in zip(polys, actors, cap["slots"]):
            poly.points = slot["verts"][fr].astype(np.float64)
            actor.GetProperty().SetOpacity(slot["opacity"][fr])
        pl.update()

    fps_arr = [1, 2, 5, 10, 15, 30, 40, 50, 60]

    def _nearest_fps_idx():
        return int(np.argmin([abs(f - state["fps"]) for f in fps_arr]))

    pl.add_key_event("q", lambda: pl.close())
    pl.add_key_event("space",
                     lambda: state.update(paused=not state["paused"]))
    pl.add_key_event("Left", lambda: (state.update(
        fr=max(state["fr"] - 1, 0)), update()))
    pl.add_key_event("Right", lambda: (state.update(
        fr=min(state["fr"] + 1, num_fr - 1)), update()))
    pl.add_key_event("Up", lambda: (state.update(fr=0), update()))
    pl.add_key_event("Down", lambda: (state.update(fr=num_fr - 1), update()))
    pl.add_key_event("s", lambda: state.update(
        fps=fps_arr[max(_nearest_fps_idx() - 1, 0)]))
    pl.add_key_event("d", lambda: state.update(
        fps=fps_arr[min(_nearest_fps_idx() + 1, len(fps_arr) - 1)]))
    pl.add_key_event("a", lambda: state.update(reverse=not state["reverse"]))
    pl.add_key_event("g", lambda: state.update(repeat=not state["repeat"]))

    import time
    pl.show(interactive_update=True)
    update()
    while not pl._closed:                               # pragma: no cover
        t0 = time.time()
        if not state["paused"]:
            step = -1 if state["reverse"] else 1
            nxt = state["fr"] + step
            if 0 <= nxt < num_fr:
                state["fr"] = nxt
            elif state["repeat"]:
                state["fr"] = 0 if step > 0 else num_fr - 1
            update()
        else:
            pl.update()
        dt = 1.0 / state["fps"] - (time.time() - t0)
        if dt > 0:
            time.sleep(dt)


# ------------------------------------------------------------ HTML viewer

_HTML_TEMPLATE = r"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title><style>
html,body{margin:0;height:100%;background:#1c1c22;color:#ddd;
font:13px system-ui,sans-serif;overflow:hidden}
#c{display:block;width:100vw;height:100vh}
#hud{position:fixed;left:10px;bottom:10px;background:rgba(0,0,0,.55);
padding:6px 10px;border-radius:6px;white-space:pre;pointer-events:none}
#help{position:fixed;right:10px;top:10px;background:rgba(0,0,0,.55);
padding:6px 10px;border-radius:6px;white-space:pre;font-size:12px;
color:#aac}
</style></head><body>
<canvas id="c"></canvas><div id="hud"></div>
<div id="help">drag orbit · wheel zoom · shift-drag pan
space pause · &larr;/&rarr; step · s/d speed · a reverse
g repeat · &uarr;/&darr; start/end · q help off</div>
<script>
"use strict";
const META = __META__;
const BUFS = __BUFS__;
function b64(name, T){const s=atob(BUFS[name]);
 const u=new Uint8Array(s.length);for(let i=0;i<s.length;i++)u[i]=s.charCodeAt(i);
 return new T(u.buffer);}
const meshes = META.meshes.map((m,i)=>({
 q:b64("mv"+i,Uint16Array), f:b64("mf"+i,Int32Array), m}));
const lineBuf=b64("lines",Float32Array), lineOff=b64("line_off",Int32Array),
 lineCol=b64("line_col",Uint8Array);
const ptBuf=b64("points",Float32Array), ptOff=b64("point_off",Int32Array),
 ptCol=b64("point_col",Uint8Array);
const T = META.num_fr;
// scene center/extent for the default orbit target
let lo=[1e9,1e9,1e9],hi=[-1e9,-1e9,-1e9];
for(const me of meshes)for(let a=0;a<3;a++){
 lo[a]=Math.min(lo[a],me.m.lo[a]);
 hi[a]=Math.max(hi[a],me.m.lo[a]+me.m.scale[a]*65535);}
if(meshes.length===0){lo=[-1,-1,0];hi=[1,1,2];}
const ctr=[(lo[0]+hi[0])/2,(lo[1]+hi[1])/2,(lo[2]+hi[2])/2];
const ext=Math.max(hi[0]-lo[0],hi[1]-lo[1],hi[2]-lo[2],1);
const cam={az:-0.7,el:0.45,dist:2.2*ext,tgt:ctr.slice(),fov:50};
const st={fr:0,paused:false,rev:false,repeat:true,fps:META.fps,help:true};
const cv=document.getElementById("c"),ctx=cv.getContext("2d");
function fit(){cv.width=innerWidth*devicePixelRatio;
 cv.height=innerHeight*devicePixelRatio;}
fit();addEventListener("resize",fit);
function camBasis(){
 const ce=Math.cos(cam.el),se=Math.sin(cam.el),
  ca=Math.cos(cam.az),sa=Math.sin(cam.az);
 const eye=[cam.tgt[0]+cam.dist*ce*ca, cam.tgt[1]+cam.dist*ce*sa,
  cam.tgt[2]+cam.dist*se];
 let f=[cam.tgt[0]-eye[0],cam.tgt[1]-eye[1],cam.tgt[2]-eye[2]];
 const fl=Math.hypot(...f); f=f.map(v=>v/fl);
 const upw=[0,0,1];
 let r=[f[1]*upw[2]-f[2]*upw[1], f[2]*upw[0]-f[0]*upw[2],
  f[0]*upw[1]-f[1]*upw[0]];
 const rl=Math.hypot(...r)||1e-9; r=r.map(v=>v/rl);
 const d=[f[1]*r[2]-f[2]*r[1], f[2]*r[0]-f[0]*r[2], f[0]*r[1]-f[1]*r[0]];
 return {eye,r,d,f};
}
function project(xyz,B,W,H,fpx){
 const x=xyz[0]-B.eye[0],y=xyz[1]-B.eye[1],z=xyz[2]-B.eye[2];
 const cz=x*B.f[0]+y*B.f[1]+z*B.f[2];
 if(cz<0.05)return null;
 const cx=x*B.r[0]+y*B.r[1]+z*B.r[2], cy=x*B.d[0]+y*B.d[1]+z*B.d[2];
 return [W/2+fpx*cx/cz, H/2+fpx*cy/cz, cz];
}
function draw(){
 const W=cv.width,H=cv.height;
 const fpx=0.5*H/Math.tan(cam.fov*Math.PI/360);
 const B=camBasis();
 ctx.fillStyle="#1c1c22";ctx.fillRect(0,0,W,H);
 // ground checkerboard
 if(META.show_ground){
  const n=10,e2=1.2*ext+2,stp=2*e2/n;
  const shades=["#46464e","#5f5f69"];
  for(let i=0;i<n;i++)for(let j=0;j<n;j++){
   const x0=ctr[0]-e2+i*stp,y0=ctr[1]-e2+j*stp,gz=META.ground_z;
   const q=[[x0,y0,gz],[x0+stp,y0,gz],[x0+stp,y0+stp,gz],[x0,y0+stp,gz]]
    .map(p=>project(p,B,W,H,fpx));
   if(q.some(p=>!p))continue;
   ctx.fillStyle=shades[(i+j)%2];ctx.beginPath();
   ctx.moveTo(q[0][0],q[0][1]);
   for(let k=1;k<4;k++)ctx.lineTo(q[k][0],q[k][1]);
   ctx.closePath();ctx.fill();}}
 // meshes: painter with flat shade
 const faces=[];
 for(const me of meshes){
  const nv=me.m.nv, off=st.fr*nv*3, s=me.m.scale, l=me.m.lo;
  const P=new Array(nv), Wd=new Array(nv);
  for(let v=0;v<nv;v++){
   const w=[l[0]+s[0]*me.q[off+v*3], l[1]+s[1]*me.q[off+v*3+1],
    l[2]+s[2]*me.q[off+v*3+2]];
   Wd[v]=w; P[v]=project(w,B,W,H,fpx);}
  const col=me.m.color, op=me.m.opacity[st.fr];
  for(let t=0;t<me.m.nf;t++){
   const a=me.f[t*3],b=me.f[t*3+1],c=me.f[t*3+2];
   const pa=P[a],pb=P[b],pc=P[c];
   if(!pa||!pb||!pc)continue;
   const wa=Wd[a],wb=Wd[b],wc=Wd[c];
   const u=[wb[0]-wa[0],wb[1]-wa[1],wb[2]-wa[2]],
    v2=[wc[0]-wa[0],wc[1]-wa[1],wc[2]-wa[2]];
   const nx=u[1]*v2[2]-u[2]*v2[1],ny=u[2]*v2[0]-u[0]*v2[2],
    nz=u[0]*v2[1]-u[1]*v2[0];
   const nl=Math.hypot(nx,ny,nz)||1e-9;
   const sh=0.4+0.6*Math.abs((nx*B.f[0]+ny*B.f[1]+nz*B.f[2])/nl);
   faces.push([(pa[2]+pb[2]+pc[2])/3,pa,pb,pc,
    `rgb(${col[0]*sh|0},${col[1]*sh|0},${col[2]*sh|0})`,op]);}}
 faces.sort((x,y)=>y[0]-x[0]);
 for(const f of faces){
  ctx.globalAlpha=f[5];ctx.fillStyle=f[4];ctx.strokeStyle=f[4];
  ctx.beginPath();ctx.moveTo(f[1][0],f[1][1]);
  ctx.lineTo(f[2][0],f[2][1]);ctx.lineTo(f[3][0],f[3][1]);
  ctx.closePath();ctx.fill();ctx.stroke();}
 ctx.globalAlpha=1;
 // lines
 const lo0=lineOff[st.fr],lo1=lineOff[st.fr+1];
 ctx.lineWidth=2*devicePixelRatio;
 for(let i=lo0;i<lo1;i+=2){
  const p0=project([lineBuf[i*3],lineBuf[i*3+1],lineBuf[i*3+2]],B,W,H,fpx);
  const p1=project([lineBuf[(i+1)*3],lineBuf[(i+1)*3+1],
   lineBuf[(i+1)*3+2]],B,W,H,fpx);
  if(!p0||!p1)continue;
  ctx.strokeStyle=`rgb(${lineCol[i*3]},${lineCol[i*3+1]},${lineCol[i*3+2]})`;
  ctx.beginPath();ctx.moveTo(p0[0],p0[1]);ctx.lineTo(p1[0],p1[1]);
  ctx.stroke();}
 // points
 const po0=ptOff[st.fr],po1=ptOff[st.fr+1];
 for(let i=po0;i<po1;i++){
  const p=project([ptBuf[i*3],ptBuf[i*3+1],ptBuf[i*3+2]],B,W,H,fpx);
  if(!p)continue;
  ctx.fillStyle=`rgb(${ptCol[i*3]},${ptCol[i*3+1]},${ptCol[i*3+2]})`;
  ctx.beginPath();ctx.arc(p[0],p[1],3*devicePixelRatio,0,7);ctx.fill();}
 document.getElementById("hud").textContent=
  `frame ${st.fr+1}/${T}  ${st.paused?"⏸":"▶"}${st.rev?" rev":""}`+
  `  ${st.fps} fps${st.repeat?"  loop":""}`;
}
// ------- interaction
let dragging=false,panning=false,lx=0,ly=0;
cv.addEventListener("mousedown",e=>{dragging=true;panning=e.shiftKey;
 lx=e.clientX;ly=e.clientY;});
addEventListener("mouseup",()=>dragging=false);
addEventListener("mousemove",e=>{
 if(!dragging)return;
 const dx=e.clientX-lx,dy=e.clientY-ly;lx=e.clientX;ly=e.clientY;
 if(panning){
  const B=camBasis(),k=cam.dist/800;
  for(let a=0;a<3;a++)cam.tgt[a]+=(-dx*B.r[a]+dy*B.d[a])*k;
 }else{
  cam.az-=dx*0.008;
  cam.el=Math.min(1.5,Math.max(-1.5,cam.el+dy*0.008));}
 draw();});
cv.addEventListener("wheel",e=>{e.preventDefault();
 cam.dist*=Math.exp(e.deltaY*0.001);draw();},{passive:false});
const FPS=[1,2,5,10,15,30,40,50,60];
addEventListener("keydown",e=>{
 const i=FPS.reduce((b,f,j)=>Math.abs(f-st.fps)<Math.abs(FPS[b]-st.fps)?j:b,0);
 switch(e.key){
  case " ":st.paused=!st.paused;e.preventDefault();break;
  case "ArrowLeft":st.fr=Math.max(st.fr-1,0);break;
  case "ArrowRight":st.fr=Math.min(st.fr+1,T-1);break;
  case "ArrowUp":st.fr=0;e.preventDefault();break;
  case "ArrowDown":st.fr=T-1;e.preventDefault();break;
  case "s":st.fps=FPS[Math.max(i-1,0)];break;
  case "d":st.fps=FPS[Math.min(i+1,FPS.length-1)];break;
  case "a":st.rev=!st.rev;break;
  case "g":st.repeat=!st.repeat;break;
  case "q":st.help=!st.help;
   document.getElementById("help").style.display=st.help?"":"none";break;
 }
 draw();});
// ------- animation loop
let last=0;
function loop(ts){
 if(!st.paused && ts-last>=1000/st.fps){
  last=ts;
  const step=st.rev?-1:1, nxt=st.fr+step;
  if(nxt>=0&&nxt<T)st.fr=nxt;
  else if(st.repeat)st.fr=step>0?0:T-1;
  draw();}
 requestAnimationFrame(loop);}
draw();requestAnimationFrame(loop);
</script></body></html>
"""
